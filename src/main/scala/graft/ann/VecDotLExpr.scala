package graft.ann

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Fused long-array dot product — the integer sibling of [[VecDotExpr]]
  * for the sign-matrix family: [[RandomProjection.project]] evaluates
  * outDim (16) of these per ROW against constant ±1 sign arrays, and
  * [[RandomProjection.jlDistortion]] another outDim per sampled pair —
  * as `aggregate(zip_with(...))` trees that ran interpreted with
  * ~outDim·dim lambda rows per input row, outside every codegen span.
  *
  * SEMANTICS CONTRACT — bit-identical to
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0L, +)` over two long
  * arrays under the pinned non-ANSI session: products and the running
  * sum in Java long arithmetic (wrap-around matches non-ANSI
  * Multiply/Add), ASCENDING index order; length mismatch ⇒ null
  * (zip_with null padding poisons the sum); any null element ⇒ null;
  * empty ⇒ 0; null array ⇒ null. VecDotLParity in SimilaritySpec pins
  * equality; q85/q269/q158/q168 re-gate end-to-end.
  */
object VecDotL {

  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  /** Column form over two `array<long>` columns. */
  def dotFused(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(VecDotLExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }
}

case class VecDotLExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_l"
  override def nullSafeEval(a: Any, b: Any): Any =
    VecDotL.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecDotLRes")
      s"""java.lang.Long $r = graft.ann.VecDotL.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotLExpr =
    copy(left = newLeft, right = newRight)
}
