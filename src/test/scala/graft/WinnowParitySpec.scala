package graft

import org.apache.spark.sql.functions._

/** Parity contracts of the two round-3 fused kernels against their
  * declarative references, over the corpora AND adversarial strings:
  *
  *  - [[graft.dedup.Winnow]] (monotonic-deque winnowing selection) vs
  *    the O(n·w) argmin-per-window HOF tree
  *    ([[graft.dedup.Dedup.winnowStatsDeclarative]]);
  *  - [[graft.text.LogTemplate]] (broadcast keep-set map-only rebuild)
  *    vs the posexplode → broadcast-join → collect_list reassembly
  *    ([[graft.operators.DqRules.logTemplatesDeclarative]]).
  */
class WinnowParitySpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def diff(a: org.apache.spark.sql.DataFrame,
                   b: org.apache.spark.sql.DataFrame): Unit = {
    val d1 = a.except(b).collect(); val d2 = b.except(a).collect()
    assert(d1.isEmpty && d2.isEmpty,
      s"fused-only: ${d1.take(3).mkString(";")}\ndecl-only: ${d2.take(3).mkString(";")}")
  }

  test("fused winnow equals declarative argmin selection over the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (w <- Seq(1, 2, 4, 7))
      diff(dedup.Dedup.winnowStats(docs, w),
        dedup.Dedup.winnowStatsDeclarative(docs, w))
  }

  test("fused winnow equals declarative on adversarial strings") {
    val cases = Seq(
      "",                        // 0 grams → 0 fps
      "one two",                 // 0 grams (< 3 tokens)
      "one two three",           // 1 gram, n < w whole-array window
      "a b c d e",               // 3 grams, still < w=4
      "a b c d e f",             // exactly one w=4 window
      "a b c a b c a b c a b c", // periodic: heavy fp ties (rightmost rule)
      "x x x x x x x x x x",     // all-equal shingles: single fp
      "MiXeD CaSe a b MIXED case a b",
      "tab\tsep\nnl\rcr a b c d e f g",
      "é ünï côdé a b c d é ünï côdé a b"
    )
    val docs = cases.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    for (w <- Seq(1, 3, 4))
      diff(dedup.Dedup.winnowStats(docs, w),
        dedup.Dedup.winnowStatsDeclarative(docs, w))
  }

  test("map-only template rebuild equals declarative reassembly") {
    val t = sources.Transcripts.loadCanonical(spark, "/root/testdata/sf0.001")
    for (mc <- Seq(5L, 50L))
      diff(operators.DqRules.logTemplates(t, mc),
        operators.DqRules.logTemplatesDeclarative(t, mc))
  }

  test("template rebuild drops zero-token turns like the declarative") {
    val rows = Seq(
      ("c1", 0, "user", "alpha beta gamma", "t", "2024-01-01 00:00:00"),
      ("c1", 1, "tool", "   ", "t", "2024-01-01 00:00:01"), // ws-only: dropped
      ("c1", 2, "user", "", "t", "2024-01-01 00:00:02"),    // empty: dropped
      ("c2", 0, "user", "alpha beta rare1", "t", "2024-01-01 00:00:03"),
      ("c2", 1, "user", "alpha beta rare2", "t", "2024-01-01 00:00:04"))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val got = operators.DqRules.logTemplates(rows, 2L)
      .orderBy("template").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("alpha beta <*>", 3L)))
    diff(operators.DqRules.logTemplates(rows, 2L),
      operators.DqRules.logTemplatesDeclarative(rows, 2L))
  }
}
