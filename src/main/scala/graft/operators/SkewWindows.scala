package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe sequence windowing: lag(1) over (key, ord) with the per-key
  * sort SPLIT into fixed ord-range chunks, for corpora where one hot key
  * (the 1M-turn conversation) would otherwise sort in a single task.
  *
  * The plain `Window.partitionBy(key).orderBy(ord)` ships every row of a
  * key to ONE task — at 10^12 turns a hot conversation is a straggler by
  * construction. Here the shuffle key is (key, floor(ord/chunk)): the hot
  * key splits into ord-range chunks that sort independently, and the only
  * cross-chunk work is the BOUNDARY STITCH — each chunk's first row needs
  * its global predecessor, which is by construction the last row of the
  * nearest non-empty lower chunk. Chunk first/last rows come from a
  * map-side-combinable min_by/max_by hash-agg (NOT a second sort+window
  * over the corpus — only per-chunk summaries shuffle), and the stitch is
  * a lag over that rows/chunk-bounded frame, emitted as a union branch.
  * No single task ever sorts more than `chunk` rows of one key.
  *
  * Row-identity to the plain-window lag is proven in SkewWindowSpec
  * (gapped ords, empty chunks, single-row chunks) and by the q182 oracle,
  * whose SQL is the PLAIN lag formulation.
  *
  * COST CROSSOVER (measured, bench corpus, local[32], 5M rows with a 20%
  * hot conversation): plain 3.1 s vs chunked 4.1 s — the chunked form
  * pays a second corpus scan for the edge-cell aggregate, and at this
  * scale the hot key's 1M-row sort is only ~1 s of straggle. The operator
  * targets the regime where the straggler dominates wall-clock: a hot key
  * holding multi-GB of one partition on a 1000-executor cluster, where
  * one task sorting 10^8+ rows gates the stage while the second scan is
  * embarrassingly parallel. Use plain lag until the skew audit
  * (`Layout.partitionSkewStats`, `JoinPlanner.joinForecast`) says
  * otherwise.
  */
object SkewWindows {

  /** (key, ord, prev, v): for every input row, the value of the previous
    * row of the same key by ord — exactly lag(v, 1), computed skew-safe.
    * Requires ord unique within key (turn_idx's contract, W1). */
  def adjacentPairs(df: DataFrame, key: String, ord: String, value: String,
                    chunk: Long = 65536L): DataFrame = {
    val base = df.select(col(key).as("k"), col(ord).as("o"),
      col(value).as("v"))
      .withColumn("bkt", floor(col("o") / chunk).cast("long"))
    // branch A — interior pairs: one chunk-keyed sort+window; the hot
    // key's sort is chunk-bounded. Chunk-first rows (rn=1) are emitted
    // by branch B instead.
    val w = Window.partitionBy("k", "bkt").orderBy("o")
    val interior = base
      .withColumn("prev", lag(col("v"), 1).over(w))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .select(col("k"), col("o"), col("prev"), col("v"))
    // branch B — chunk-edge rows via a map-side-combinable hash-agg (NO
    // second sort+window over the corpus: min_by/max_by partial-aggregate
    // off the scan, so only per-chunk summaries shuffle). Empty chunks
    // are simply absent, so the nearest non-empty lower chunk is the
    // PREVIOUS ROW of the per-key bkt order — a lag over the tiny frame.
    val cells = base.groupBy("k", "bkt").agg(
      min(col("o")).as("first_o"),
      min_by(col("v"), col("o")).as("first_v"),
      max_by(col("v"), col("o")).as("last_v"))
    val stitchW = Window.partitionBy("k").orderBy("bkt")
    val firsts = cells
      .withColumn("prev", lag(col("last_v"), 1).over(stitchW))
      .select(col("k"), col("first_o").as("o"), col("prev"),
        col("first_v").as("v"))
    interior.unionByName(firsts)
  }

  /** The plain-lag twin of [[adjacentPairs]] — one key-keyed sort+window,
    * the right plan when no key is hot (it skips the chunked form's
    * second scan for the edge-cell aggregate). */
  def adjacentPairsPlain(df: DataFrame, key: String, ord: String,
                         value: String): DataFrame = {
    val w = Window.partitionBy("k").orderBy("o")
    df.select(col(key).as("k"), col(ord).as("o"), col(value).as("v"))
      .withColumn("prev", lag(col("v"), 1).over(w))
      .select(col("k"), col("o"), col("prev"), col("v"))
  }

  /** Deterministic plan choice for [[adjacentPairsAuto]]: chunked iff any
    * key holds ≥ `hotKeyRows` rows — the point where one task's sort
    * gates the stage. One map-side-combinable key-count agg reduced to a
    * single driver scalar (a production pipeline that already ran the
    * layout audit passes that result instead of rescanning). */
  def chooseChunked(df: DataFrame, key: String, hotKeyRows: Long): Boolean = {
    val m = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("m")).collect()(0)
    !m.isNullAt(0) && m.getLong(0) >= hotKeyRows
  }

  /** [[chooseChunked]] on a deterministic 1/`sampleMod` ord-slice: the
    * per-key count aggregates only rows with `ord % sampleMod == 0`, and
    * the max scales back up by `sampleMod`. Detecting a multi-million-row
    * hot key doesn't need exact counts — a 1% slice of an 8M-turn
    * conversation is still 80k rows — and the sampled agg turns the
    * dispatch from a corpus-sized exchange into a sliver one (measured
    * ~0.6 s → ~0.2 s at sf0.1), which is what lets the AUTO path track
    * the plain branch when no key is hot. Exact [[chooseChunked]] stays
    * for callers that already pay a layout audit. */
  def chooseChunkedSampled(df: DataFrame, key: String, ord: String,
                           hotKeyRows: Long,
                           sampleMod: Long = 100L): Boolean = {
    val m = df.filter(col(ord) % sampleMod === 0L)
      .groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("m")).collect()(0)
    !m.isNullAt(0) && m.getLong(0) * sampleMod >= hotKeyRows
  }

  /** The measured-crossover dispatcher: plain lag until a key is hot
    * enough that its single-task sort dominates wall-clock, chunked+stitch
    * beyond (see the cost-crossover note above — plain wins at 5M rows /
    * 20% skew on one box; chunked wins when the hot key holds multi-GB of
    * one partition). Both branches are row-identical (SkewWindowSpec,
    * q182), so the choice is purely a cost decision. */
  def adjacentPairsAuto(df: DataFrame, key: String, ord: String,
                        value: String, chunk: Long = 65536L,
                        hotKeyRows: Long = 4L * 65536L): DataFrame =
    if (chooseChunked(df, key, hotKeyRows))
      adjacentPairs(df, key, ord, value, chunk)
    else adjacentPairsPlain(df, key, ord, value)

  /** Directed weighted tool-transition edges — Graphs.toolTransitionEdges'
    * semantics via the skew-safe window (q182 proves row-identity through
    * the plain-lag oracle). */
  def toolTransitionEdgesSalted(canonical: DataFrame,
                                chunk: Long = 65536L): DataFrame =
    adjacentPairs(canonical, "conv_id", "turn_idx", "tool", chunk)
      .select(col("prev").as("src"), col("v").as("dst"))
      .filter(col("src").isNotNull && col("src") =!= "" &&
        col("dst") =!= "" && col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))

  /** Cost-dispatched edge build — the production entry: plain one-window
    * [[graft.graph.Graphs.toolTransitionEdges]] until some conversation
    * holds ≥ `hotKeyRows` turns, chunk+stitch beyond. Both branches are
    * row-identical (q182/q296 + SkewWindowSpec), so the dispatch is
    * purely a cost decision, made on the sampled key profile
    * ([[chooseChunkedSampled]] — a sliver agg, not a corpus exchange).
    *
    * The default threshold is CALIBRATED to the measured crossover, not
    * the chunk size: on the bench corpus (local[32], 5M rows, ONE
    * conversation holding 20% = 1M rows) plain still wins — 2.74 s vs
    * 3.34 s chunked — because the post-lag hash-agg collapses
    * immediately and a 1M-row single-task sort is ~1 s of straggle. The
    * chunked form earns its second scan when the hot key's sort is the
    * STAGE gate: ~10⁷+ rows of one key in one task (multi-GB at
    * transcript row widths), hence 1<<23 ≈ 8.4M. A pipeline that
    * already ran `Layout.partitionSkewStats` can dispatch for free on
    * that result via [[chooseChunked]]'s contract instead. */
  def toolTransitionEdgesAuto(canonical: DataFrame,
                              chunk: Long = 65536L,
                              hotKeyRows: Long = 1L << 23): DataFrame =
    if (chooseChunkedSampled(canonical, "conv_id", "turn_idx", hotKeyRows))
      toolTransitionEdgesSalted(canonical, chunk)
    else graft.graph.Graphs.toolTransitionEdges(canonical)
}
