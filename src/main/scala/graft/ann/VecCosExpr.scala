package graft.ann

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity — one array traversal for what the composed
  * form `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` spends three
  * [[VecDot]] passes on (plus three codegen call sites per pair). The
  * cosine is the per-CANDIDATE kernel of the ANN family: in a bucketed /
  * IVF probe every query×candidate row pays it, so the traversal count is
  * the LSH/IVF candidate volume — at 100 TB, cutting 3 passes to 1 (and
  * the two norm passes' null re-checks with them) multiplies directly
  * into every ANN fleet-hour the same way [[VecDotExpr]]'s fusion did.
  *
  * SEMANTICS CONTRACT — bit-identical to the composed form under this
  * engine's pinned non-ANSI session ([[graft.Graft]]):
  *  - all three sums (a·b, a·a, b·b) accumulate in double, ASCENDING
  *    index order — the same fold order as three separate [[VecDot]]
  *    loops, so the same roundings, so the same bits;
  *  - result = sab / (sqrt(saa) * sqrt(sbb)), the identical double ops;
  *  - length mismatch ⇒ null (composed: dot(a,b) nulls and poisons the
  *    division), any null element on either side ⇒ null, null array ⇒
  *    null (BinaryExpression null-intolerance);
  *  - zero denominator (zero or empty vectors) ⇒ null — Spark's
  *    non-ANSI `Divide` returns null on a zero divisor for doubles too
  *    (`DivModLike.isZero` guards before the IEEE division), and the
  *    session pins ANSI off; NaN elements flow through IEEE semantics
  *    exactly as in the composed form (NaN denominator is NOT zero, so
  *    the division proceeds to NaN either way).
  * Element types may be float or double independently per side.
  * VecCosParity in SimilaritySpec pins bit-equality against the
  * declarative composition over corpus pairs plus the adversarial shapes
  * (mismatched lengths, null element, empty and zero vectors); the ANN
  * oracle battery re-gates end-to-end.
  */
object VecCos {

  def compute(a: ArrayData, b: ArrayData, leftFloat: Boolean,
              rightFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var sab = 0.0
    var saa = 0.0
    var sbb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      sab += x * y
      saa += x * x
      sbb += y * y
      i += 1
    }
    val denom = Math.sqrt(saa) * Math.sqrt(sbb)
    if (denom == 0.0) null else sab / denom
  }

  /** Column form; resolves element types at plan time. */
  def cosFused(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(VecCosExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }
}

case class VecCosExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_cos"
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VecCos.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("vecCosRes")
      s"""java.lang.Double $r = graft.ann.VecCos.compute(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosExpr =
    copy(left = newLeft, right = newRight)
}
