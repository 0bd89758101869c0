package graft

import org.apache.spark.sql.functions._
import graft.operators.{Filters, TurnOrdering}
import graft.sources.Transcripts

class PipelineSpec extends SparkSpec {

  test("entry produces rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("transcript synthesis is deterministic and skewed") {
    val t = Transcripts.load(spark, tiny).cache()
    assert(t.count() == 1000)
    val hot = t.filter(col("conv_id") === "conv_hot").count()
    assert(hot > 150 && hot < 250, s"hot conv rows = $hot, want ~20%")
    t.unpersist()
  }

  test("filter chain: last match wins (process_session.go:240-269)") {
    import TestSpark.spark.implicits._
    val df = Seq(
      ("wait_info", "sql_query", 0L, "user"),     // excluded then re-included
      ("wait_info", "web_fetch", 0L, "user"),     // excluded
      ("login", "", 0L, "user"),                  // default include
      ("error_reported", "", 18456L, "system"),   // excluded by rule 3
      ("error_reported", "", 18456L, "user")      // kept
    ).toDF("name", "tool", "error_number", "role")
    val kept = df.filter(Filters.filterChain(Filters.defaultRules))
      .select("name", "tool", "role").collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(kept == Set(
      ("wait_info", "sql_query", "user"),
      ("login", "", "user"),
      ("error_reported", "", "user")))
  }

  test("dbghelp suppression (process_session.go:227-233)") {
    import TestSpark.spark.implicits._
    val df = Seq(
      ("errorlog_written", "event=errorlog_written x Server   Stack dump being sent, using 'dbghelp.dll' version"),
      ("errorlog_written", "event=errorlog_written x Server   all fine")
    ).toDF("name", "text")
    assert(df.filter(Filters.dbghelpSuppression).count() == 1)
  }

  test("globalSeq equals window row_number at small scale (W4)") {
    val t = Transcripts.load(spark, tiny)
    val viaWindow = t.withColumn("seq",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("conv_id", "turn_idx")).cast("long"))
      .select("conv_id", "turn_idx", "seq")
    val viaScalable = TurnOrdering.globalSeq(t).select("conv_id", "turn_idx", "seq")
    assert(viaScalable.except(viaWindow).count() == 0)
    assert(viaWindow.except(viaScalable).count() == 0)
  }

  test("ordering golden: shuffled input re-sorts to identical per-turn text (north rule)") {
    val t = Transcripts.load(spark, tiny)
    val shuffled = t.repartition(7, col("turn_idx"))
    val a = TurnOrdering.perConvSeq(t).select("conv_id", "seq_in_conv", "text")
    val b = TurnOrdering.perConvSeq(shuffled).select("conv_id", "seq_in_conv", "text")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("per-sink counts sum to 3x routed rows (A2 north-rule aggregate)") {
    val routed = Pipeline.routed(spark, tiny).cache()
    val n = routed.count()
    val counts = graft.operators.Routing.perSinkCounts(routed)
    val total = counts.agg(sum("n")).collect()(0).getLong(0)
    assert(total == 3 * n)
    routed.unpersist()
  }
}
