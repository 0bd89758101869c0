package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.SkewWindows

/** Row-identity proofs for the skew-safe chunked lag (q182): the chunked
  * window + boundary stitch must reproduce the plain per-key lag exactly,
  * on gapped ords, empty chunks, singleton chunks, and the real corpus. */
class SkewWindowSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def plainPairs(df: DataFrame): Set[(String, Long, String, String)] = {
    val w = Window.partitionBy("k").orderBy("o")
    df.select(col("k"), col("o"), lag(col("v"), 1).over(w).as("prev"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)).orNull, r.getString(3))).toSet
  }

  private def chunkedPairs(df: DataFrame, chunk: Long) =
    SkewWindows.adjacentPairs(df, "k", "o", "v", chunk)
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)).orNull, r.getString(3))).toSet

  test("adjacentPairs == plain lag on gapped ords and empty chunks") {
    val df = Seq(
      ("a", 0L, "t0"), ("a", 1L, "t1"), ("a", 2L, "t2"), ("a", 3L, "t3"),
      ("a", 4L, "t4"), ("a", 5L, "t5"),
      ("b", 0L, "x"), ("b", 9L, "y"), ("b", 17L, "z"), // chunks 0,2,4 — 1,3 empty
      ("c", 7L, "solo"))
      .toDF("k", "o", "v")
    for (chunk <- Seq(1L, 2L, 4L, 100L))
      assert(chunkedPairs(df, chunk) == plainPairs(df), s"chunk=$chunk")
  }

  test("adjacentPairs == plain lag on the real corpus at a forcing chunk") {
    val t = sources.Transcripts.load(spark, tiny)
      .select(col("conv_id").as("k"), col("turn_idx").cast("long").as("o"),
        col("tool").as("v"))
    assert(chunkedPairs(t, 8L) == plainPairs(t))
  }

  test("toolTransitionEdgesSalted == Graphs.toolTransitionEdges") {
    val c = sources.Transcripts.loadCanonical(spark, tiny)
    val plain = graph.Graphs.toolTransitionEdges(c).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = SkewWindows.toolTransitionEdgesSalted(c, chunk = 8L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("adjacentPairsAuto: count-based choice, both branches row-identical") {
    import TestSpark.spark.implicits._
    val df = (Seq.tabulate(20)(i => ("hot", i.toLong, s"v$i")) ++
      Seq(("cold", 0L, "a"), ("cold", 1L, "b")))
      .toDF("k", "o", "v")
    // decision flips exactly at the hot key's row count
    assert(SkewWindows.chooseChunked(df, "k", hotKeyRows = 20L))
    assert(!SkewWindows.chooseChunked(df, "k", hotKeyRows = 21L))
    assert(!SkewWindows.chooseChunked(df.limit(0), "k", hotKeyRows = 1L),
      "empty input must choose plain, not NPE")
    // sampled dispatch: hot key rows o=0..19, 1/5 slice keeps {0,5,10,15}
    // -> est 4*5 = 20; flips at the same scaled threshold
    assert(SkewWindows.chooseChunkedSampled(df, "k", "o", hotKeyRows = 20L,
      sampleMod = 5L))
    assert(!SkewWindows.chooseChunkedSampled(df, "k", "o", hotKeyRows = 21L,
      sampleMod = 5L))
    assert(!SkewWindows.chooseChunkedSampled(df.limit(0), "k", "o",
      hotKeyRows = 1L, sampleMod = 5L), "empty input must choose plain")
    // both dispatch targets agree with each other on this input
    val auto = SkewWindows.adjacentPairsAuto(df, "k", "o", "v",
      chunk = 4L, hotKeyRows = 20L).collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(2)), r.getString(3))).toSet
    val plain = SkewWindows.adjacentPairsPlain(df, "k", "o", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(2)), r.getString(3))).toSet
    assert(auto == plain)
  }

  test("toolTransitionEdgesAuto: dispatch is output-invariant on both " +
    "sides of the crossover") {
    val c = sources.Transcripts.loadCanonical(spark, tiny)
    val plain = graph.Graphs.toolTransitionEdges(c).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // cold side: no conversation is hot -> plain branch
    val cold = SkewWindows.toolTransitionEdgesAuto(c).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(cold == plain)
    // hot side: threshold 1 row forces the chunked branch on the same
    // input; edges must be identical
    val hot = SkewWindows.toolTransitionEdgesAuto(c, chunk = 8L,
      hotKeyRows = 1L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(hot == plain)
  }
}
