package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.types._

/** Running md5 HASH CHAIN as a window aggregate: over an ordered
  * running frame the value at row i is
  * `H_i = md5(H_{i-1} || v_i)` with `H_{-1} = ""` — a 32-hex-char
  * fingerprint of the whole ordered prefix, O(1) state per row.
  *
  * This exists because the obvious prefix fingerprint —
  * `md5(concat of ALL prefix values)` via `collect_list().over(...)` —
  * is quadratic per partition BY SEMANTICS (the prefix string at row i
  * is O(i), so Σ = O(len²) bytes), and Spark's unbounded-preceding
  * window frame additionally copies the collected buffer per output
  * row. The sf1 confidence run measured q120 branching stuck for HOURS
  * on a 200k-turn hot conversation; the chain is the scalable semantic
  * (same uniqueness property: equal chains ⟺ equal ordered prefixes,
  * modulo md5 collisions) and runs at O(len) per conversation.
  *
  * CONTRACT: running-window use only (ROWS UNBOUNDED PRECEDING ..
  * CURRENT ROW over a partition). The fold is order-dependent, so
  * buffer MERGING is undefined; mergeExpressions yields null, making a
  * misuse in a groupBy aggregate surface as null output rather than a
  * silently wrong value. Null inputs are skipped (chain unchanged),
  * matching collect_list's null handling.
  */
case class HashChainAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  // nullable=true: mergeExpressions legitimately writes null into this
  // slot (the documented misuse guard below); a non-nullable declaration
  // would let codegen elide null checks and read garbage instead of the
  // contracted clean null
  private lazy val chain = AttributeReference("chain", StringType, nullable = true)()

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "hash_chain"

  override def aggBufferAttributes: Seq[AttributeReference] = chain :: Nil
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create("", StringType))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), chain,
      Md5(Cast(Concat(Seq(chain, child)), BinaryType))))
  // order-dependent fold: merging partial buffers has no meaning
  override lazy val mergeExpressions: Seq[Expression] =
    Seq(Literal.create(null, StringType))
  override lazy val evaluateExpression: Expression = chain

  override protected def withNewChildInternal(newChild: Expression): HashChainAgg =
    copy(child = newChild)
}

object HashChain {
  /** `hash_chain(c)` OVER the given running window spec. */
  def over(c: Column, w: WindowSpec): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(HashChainAgg(GraftBridge.expression(c))
      .toAggregateExpression()).over(w)
  }
}
