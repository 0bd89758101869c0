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

  test("plan audit: bloom prefilter and z-order layout stay bounded") {
    val s = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    // q149's only nested-loop join is the 1-row broadcast filter map —
    // constant-size at any corpus scale, so it's the intended shape; the
    // batch side must never hit a CartesianProduct or a hash-shuffled join
    val p149 = SparkEntry.queries("q149_bloom_prefilter")(s, d)
      .queryExecution.executedPlan.toString
    assert(!p149.contains("CartesianProduct"), "q149 has a cartesian")
    // 3 real exchanges (index distinct, word table, per-doc agg); the
    // persisted index's distinct prints once per cached-side reference
    // (word-table build + exact-arm broadcast), same as q140's guard
    assert("Exchange hashpartitioning".r.findAllIn(p149).size <= 4,
      "q149: index distinct + word table + per-doc agg only")
    assert(p149.contains("InMemoryTableScan"),
      "q149: the index set must be persisted, not recomputed per consumer")
    // q150 is map-only up to one ≤64-row aggregate
    val p150 = SparkEntry.queries("q150_zorder_layout")(s, d)
      .queryExecution.executedPlan.toString
    assert(!p150.contains("CartesianProduct") &&
      !p150.contains("BroadcastNestedLoopJoin"), "q150 must be join-free")
    assert("Exchange hashpartitioning".r.findAllIn(p150).size <= 1,
      "q150: one (layout, file_id) aggregate exchange")
  }
}
