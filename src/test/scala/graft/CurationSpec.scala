package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ann.Quantize
import graft.dedup.Curation
import graft.operators.Sessionize

/** Specs for the round-2 additions: int8 quantization (q63/q65), gap
  * sessionization (q62) and end-to-end curation (q64). */
class CurationSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  // ---- Quantize ----

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
    (50L, Array(0.0f, 0.0f, 0.0f, 0.0f)) // all-zero: maxabs = 0 guard
  ).toDF("vec_id", "embedding")

  test("quantize maps maxabs component to ±127 and zero vectors to zeros") {
    val q = Quantize.quantize(vecs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(q(0L) == Seq(127L, 0L, 0L, 0L))
    assert(q(3L) == Seq(-127L, 0L, 0L, 0L))
    assert(q(50L) == Seq(0L, 0L, 0L, 0L))
    // 0.9 maxabs: 0.9*127/0.9 = 127; 0.1*127/0.9 = 14.11 → floor 14
    assert(q(1L) == Seq(127L, 14L, 0L, 0L))
  }

  test("quantized topk ranking matches float cosine order on separable data") {
    val out = Quantize.quantizedTopK(vecs.filter(col("vec_id") =!= 50L),
      k = 3, queryMod = 100)
      .filter(col("q_id") === 0).orderBy("rank").collect()
    // same order brute float cosine gives: 1 (close), 2 (orthogonal), 3 (opposite)
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    // micro-cosines are integers and strictly ordered here
    val qcs = out.map(_.getLong(3)).toSeq
    assert(qcs == qcs.sorted.reverse)
  }

  test("fused quantized cosine is bit-identical to the declarative chain") {
    val vecs = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Quantize.quantize(vecs)
    val pairs = q.select(col("vec_id"), col("qvec"))
      .crossJoin(q.select(col("vec_id").as("id2"), col("qvec").as("q2"))
        .filter(col("id2") < 10))
    val n = pairs
      .select(Quantize.qcos(col("qvec"), col("q2")).as("d"),
        graft.ann.QCos.qcosFused(col("qvec"), col("q2")).as("f"))
      .filter(col("d") =!= col("f")).count()
    assert(n == 0, s"$n pairs diverge between fused and declarative qcos")
  }

  test("bucketed quantized topk searches only same-bucket candidates, ranks like brute") {
    // drop the zero vector; add an identical twin of id 0 so the query
    // bucket is guaranteed non-singleton
    val vs = vecs.filter(col("vec_id") =!= 50L)
      .unionByName(Seq((100L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
        .toDF("vec_id", "embedding"))
    val out = Quantize.bucketedQuantizedTopK(vs, k = 4, queryMod = 100, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val buckets = graft.ann.Similarity.buckets(vs, dim = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { case (q, n) => assert(buckets(q) == buckets(n)) }
    // plan is an equi-join, never a cartesian
    val plan = Quantize.bucketedQuantizedTopK(vs, dim = 4)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  // ---- Sessionize ----

  private def ts(min: Int) = Timestamp.valueOf(f"2026-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("gap sessionization splits on >30min gaps, per conversation") {
    val turns = Seq(
      ("c1", 0L, ts(0)), ("c1", 1L, ts(10)), ("c1", 2L, ts(45)), // 35min gap → new
      ("c1", 3L, ts(50)),
      ("c2", 0L, ts(0)), ("c2", 1L, ts(30)) // exactly 30min: NOT a new session
    ).toDF("conv_id", "turn_idx", "ts")
    val idx = Sessionize.withSessionIdx(turns).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(idx(("c1", 0L)) == 1L && idx(("c1", 1L)) == 1L)
    assert(idx(("c1", 2L)) == 2L && idx(("c1", 3L)) == 2L)
    assert(idx(("c2", 1L)) == 1L)
    val stats = Sessionize.sessionStats(turns)
      .filter(col("conv_id") === "c1" && col("session_idx") === 2).collect()(0)
    assert(stats.getLong(2) == 2L) // n_turns
    assert(stats.getTimestamp(3) == ts(45) && stats.getTimestamp(4) == ts(50))
  }

  test("sessionize plan has a single exchange (shared conv_id clustering)") {
    val plan = Sessionize.sessionStats(
      sources.Transcripts.load(spark, tiny)).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan.take(2000))
  }

  // ---- Curation ----

  test("incremental dedup verdicts a new batch against the existing index only") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
    val other = "completely different content about nothing in particular at all " * 4
    val existing = Seq((0L, base), (2L, other)).toDF("doc_id", "text")
    val newBatch = Seq(
      (1L, base),                 // exact duplicate of existing 0
      (3L, base + "home"),        // near-dup of existing 0
      (5L, "some brand new text never seen before anywhere at all " * 4),
      (7L, base)                  // also exact — exact wins over near
    ).toDF("doc_id", "text")
    val v = Curation.incrementalVerdicts(newBatch, existing).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v(1L) == "exact_dup")
    assert(v(3L) == "near_dup")
    assert(v(5L) == "new")
    assert(v(7L) == "exact_dup")
  }

  test("curation verdicts: quality gate, lang gate, exact dup, near dup, kept") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
    val docs = Seq(
      (1L, base),                        // kept (min doc_id of the exact pair)
      (2L, base),                        // exact_dup of 1
      (3L, base + "home"),               // near_dup of 1 (jaccard ≈ 13/14)
      (4L, "short"),                     // quality_too_short
      (5L, "le chat et le chien sont dans la maison avec les autres et il y a une table " * 3) // lang
    ).toDF("doc_id", "text")
    val v = Curation.curate(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v(1L) == "kept")
    assert(v(2L) == "exact_dup")
    assert(v(3L) == "near_dup")
    assert(v(4L) == "quality_too_short")
    assert(v(5L) == "lang")
  }

  test("prefixMassStats: front-loaded vs uniform vs zero vectors") {
    val front = Array.tabulate(64)(i => if (i < 16) 1.0f else 0.0f)
    val uniform = Array.fill(64)(1.0f)
    val zero = Array.fill(64)(0.0f)
    val vecs = Seq((1L, front), (2L, uniform), (3L, zero))
      .toDF("vec_id", "embedding")
    val out = graft.ann.Quantize.prefixMassStats(vecs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val m = 1000L * 1000L                      // one milli-quantized 1.0f²
    assert(out(1L) == ((16 * m, 16 * m, 1000L, true)))
    assert(out(2L) == ((64 * m, 16 * m, 250L, false)))
    assert(out(3L) == ((0L, 0L, 0L, false)))
  }

  test("concurrencyProfile: midnight-crossing spans carry opening offsets") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // A [100,200] day 0; B point session at 150; C [180, 86500] crosses
    // midnight; D [86450, 86460] runs inside C on day 1
    val turns = Seq(
      ("A", 100L), ("A", 200L),
      ("B", 150L),
      ("C", 180L), ("C", 86500L),
      ("D", 86450L), ("D", 86460L)
    ).toDF("conv_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val out = Sessionize.concurrencyProfile(turns).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // day 0: A,B,C open together at most 2 at once (B closes at its own
    // instant); C stays open into day 1 => net +1
    assert(out(0L) == ((0L, 2L, 1L)))
    // day 1 OPENS with C still active; D inside C peaks at 2; both close
    assert(out(1L) == ((1L, 2L, -1L)))
  }

  test("releaseFunnel: one doc dropped per gate, attrition exact") {
    val docs = Seq(
      (1L, "the model reads and writes data tables quickly without wasting memory"),
      (2L, "la casa de los gatos es muy bonita hoy mismo aqui"),
      (3L, "buy now the best and cheapest product of all time here"),
      (4L, "the model reads and writes data tables quickly without wasting memory"),
      (5L, "tiny")
    ).toDF("doc_id", "text")
    val out = graft.dedup.Curation.releaseFunnel(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out(0L) == (("input", 5L, 0L)))
    assert(out(1L) == (("quality_ok", 4L, 1L)), "doc 5 is too_short")
    assert(out(2L) == (("lang_en", 3L, 1L)), "doc 2 reads as es")
    assert(out(3L) == (("blocklist_clean", 2L, 1L)), "doc 3 says buy now")
    assert(out(4L) == (("dedup_keeper", 1L, 1L)), "doc 4 clones doc 1")
  }
}
