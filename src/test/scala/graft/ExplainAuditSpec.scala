package graft

/** Executed-plan regression audit for the newest operator families: no
  * cartesian/nested-loop joins anywhere, and exchange counts pinned so a
  * future refactor can't silently re-introduce plan-copy recomputation
  * (the q140 band union originally re-ran the conv_id aggregation per
  * band side — 10 exchanges; the persisted-shx + posexplode shape is 5). */
class ExplainAuditSpec extends SparkSpec {
  test("plan audit: q134/q138/q140 exchange counts and join kinds") {
    val s = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    def audit(q: String) = {
      val p = SparkEntry.queries(q)(s, d).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q has a product join")
      "Exchange hashpartitioning".r.findAllIn(p).size
    }
    // 5 core exchanges + the hot-bucket guard's (band_idx, band_sig)
    // window shuffle, which prints once per cached-side reference
    assert(audit("q140_conv_neardup") <= 7)
    assert(audit("q134_lm_score") <= 3)   // model agg, prefix agg, doc agg
    assert(audit("q138_join_forecast") <= 2)  // the two histograms
  }
}
