package graft.ann

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused quantized cosine — the ANN-stage sibling of TokenHashExpr: one
  * tight primitive loop computes dot, |a|² and |b|² over the int8 (long)
  * component arrays, replacing three higher-order-function chains
  * (zip_with + 2×transform + 3×aggregate) that evaluate interpreted with
  * per-element lambda allocation.
  *
  * SEMANTICS CONTRACT: bit-identical to the declarative
  * [[Quantize.qcos]] for equal-length arrays — long products/sums
  * (associative, exact for dim·127² ≪ 2⁶³), one final
  * double division by the product of double sqrts. QCosParity test in
  * CurationSpec asserts equality over the corpus; q65/q72 re-gate the
  * end-to-end results against DuckDB.
  */
object QCos {

  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      val y = b.getLong(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  /** Column form of the fused expression. */
  def qcosFused(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(QCosExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }
}

case class QCosExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "quantized_cosine"
  override def nullSafeEval(a: Any, b: Any): Any =
    QCos.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.ann.QCos.compute($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QCosExpr =
    copy(left = newLeft, right = newRight)
}
