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
  * nearest non-empty lower chunk. The stitch runs a plain window over the
  * chunk-EDGE rows only (≤2 rows per (key, chunk) — rows/chunk-bounded,
  * the same reduction trick as the per-partition-counts zip), so no
  * single task ever sees more than `chunk` full rows of one key.
  *
  * Row-identity to the plain-window lag is proven in SkewWindowSpec
  * (gapped ords, empty chunks, single-row chunks) and by the q182 oracle,
  * whose SQL is the PLAIN lag formulation.
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
    val w = Window.partitionBy("k", "bkt").orderBy("o")
    val within = base
      .withColumn("prev", lag(col("v"), 1).over(w))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("k", "bkt")))
    // interior rows already carry their predecessor from the chunk window
    val interior = within.filter(col("rn") > 1)
      .select(col("k"), col("o"), col("prev"), col("v"))
    // chunk-edge rows: first and last of every (k, bkt) — a tiny frame,
    // so its UNSPLIT per-key window below is rows/chunk-bounded
    val edges = within
      .filter(col("rn") === 1 || col("rn") === col("cnt"))
      .select(col("k"), col("o"), col("v"),
        (col("rn") === 1).as("is_first"),
        (col("rn") === col("cnt")).as("is_last"))
    // nearest preceding LAST row per key = the global predecessor of a
    // chunk-first row (chunks partition the ord range monotonically);
    // emitted as a UNION branch, not a join back — no corpus-wide
    // (k, o) re-shuffle
    val stitchW = Window.partitionBy("k").orderBy("o")
      .rowsBetween(Window.unboundedPreceding, -1)
    val firsts = edges
      .withColumn("lastv", when(col("is_last"), col("v")))
      .withColumn("sprev", last(col("lastv"), ignoreNulls = true).over(stitchW))
      .filter(col("is_first"))
      .select(col("k"), col("o"), col("sprev").as("prev"), col("v"))
    interior.unionByName(firsts)
  }

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
}
