package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.ParseTurnExpr

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expression as a SQL function so pure-SQL users get the fused
  * parse too:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT parse_turn(text).error_number FROM transcripts
  *
  * (SURVEY.md §4: the fused multi-field extract is the one custom
  * Catalyst component; no custom Rule/Strategy is needed — stock Catalyst
  * folds and prunes everything else.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("parse_turn"),
      new ExpressionInfo(classOf[ParseTurnExpr].getName, "parse_turn"),
      (children: Seq[Expression]) => ParseTurnExpr(children.head)))
    // the fused dedup-stage expressions, for pure-SQL users:
    //   SELECT token_sketches(text).mh0, shingle_hashes(text) FROM docs
    ext.injectFunction((
      new FunctionIdentifier("token_sketches"),
      new ExpressionInfo(classOf[graft.dedup.TokenHashExpr].getName,
        "token_sketches"),
      (children: Seq[Expression]) => graft.dedup.TokenHashExpr(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[graft.dedup.ShingleHashExpr].getName,
        "shingle_hashes"),
      (children: Seq[Expression]) => graft.dedup.ShingleHashExpr(children.head)))
    // banded Levenshtein: lev_banded(l, r, k) — k a foldable int literal
    ext.injectFunction((
      new FunctionIdentifier("lev_banded"),
      new ExpressionInfo(classOf[graft.dedup.LevBandedExpr].getName,
        "lev_banded"),
      (children: Seq[Expression]) => graft.dedup.LevBandedExpr(
        children(0), children(1),
        children(2).eval().asInstanceOf[Number].intValue())))
    // optimizer rule: plain-SQL bounded-levenshtein predicates run the
    // banded kernel (see plans.BandedLevRewrite)
    ext.injectOptimizerRule(_ => graft.plans.BandedLevRewrite)
  }
}
