package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) near-duplicate detection, blocked so the
  * O(n²·len²) pair space never materializes: candidate pairs come from an
  * equi-join on (normalized-prefix hash, length band), and the quadratic
  * DP runs only inside blocks.
  *
  * Blocking recall contract (documented, mirrored exactly by the oracle):
  * a pair is surfaced iff the two texts share their first
  * [[PrefixChars]] normalized characters AND their lengths fall in the
  * same or adjacent [[BandWidth]]-char bands. Edits inside the prefix
  * hide a pair — the standard prefix-blocking trade (cf. MinHash banding,
  * which this repo uses for token-level near-dup; edit-distance blocking
  * targets the small-typo/near-identical tail where shingles are too
  * coarse).
  *
  * Scale notes:
  *  - The shuffle is keyed on the 128-bit prefix hash + band — texts move
  *    once, and only colliding texts ever meet. Band replication (each doc
  *    emits its band and band+1) turns the |band diff| ≤ 1 predicate into
  *    a pure equi-join, so AQE can split hot blocks; without it the range
  *    term would force a nested-loop factor inside every block.
  *  - levenshtein() is codegen'd (StringUtils DP, O(len²) per pair) and
  *    runs only on candidate pairs. At 100 TB the block histogram is the
  *    knob to watch: a boilerplate prefix shared by millions of docs is a
  *    quadratic block — cap it upstream with the same hot-bucket guard the
  *    LSH path uses (Dedup.lshCandidates).
  */
object EditDedup {

  val PrefixChars = 16
  val BandWidth   = 32

  /** md5 of the lowercased first [[PrefixChars]] chars — the block key
    * half that carries content. */
  def prefixKey(text: Column): Column =
    md5(substring(lower(text), 1, PrefixChars).cast("binary"))

  /** Length band: floor(len / BandWidth). */
  def lengthBand(text: Column): Column =
    floor(length(text) / BandWidth).cast("long")

  /** Block index rows (doc_id, text, pfx, band), each doc replicated at
    * its own band and band+1 so same-and-adjacent-band pairs meet under
    * a plain equi-join: equal bands collide at both replicas (deduped by
    * the distinct in [[candidatePairs]]), adjacent bands at exactly one. */
  def blockTable(docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("doc_id"), col("text"),
      prefixKey(col("text")).as("pfx"), lengthBand(col("text")).as("band"))
    keyed.unionByName(keyed.withColumn("band", col("band") + 1L))
  }

  /** Candidate pairs: distinct (doc_a < doc_b) sharing a block cell.
    *
    * `maxBlock` is the hot-block guard: a cell holding more than
    * `maxBlock` docs (a boilerplate prefix shared corpus-wide) would be
    * a quadratic block — those cells are DROPPED, the same bounded-work
    * trade every LSH hot bucket takes. A pair whose equal-band cell
    * overflows can still surface through its adjacent-band replica cell
    * when that one is small. The count rides a window on the exact keys
    * the join shuffles on, so the guard adds no extra exchange. */
  def candidatePairs(docs: DataFrame, maxBlock: Int = 64): DataFrame = {
    val cell = org.apache.spark.sql.expressions.Window.partitionBy("pfx", "band")
    val b = blockTable(docs)
      .withColumn("cell_n", count(lit(1)).over(cell))
      .filter(col("cell_n") <= maxBlock)
    val l = b.select(col("pfx"), col("band"),
      col("doc_id").as("doc_a"), col("text").as("text_a"))
    val r = b.select(col("pfx"), col("band"),
      col("doc_id").as("doc_b"), col("text").as("text_b"))
    l.join(r, Seq("pfx", "band"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "text_a", "text_b")
      .distinct()
  }

  /** Verified edit-distance near-dup pairs: Levenshtein distance in
    * [1, maxDist] over candidate pairs, with an integer-exact similarity
    * permille = 1000 − dist·1000 ÷ max(len_a, len_b). Distance 0 (exact
    * dups) is excluded — that's [[Dedup.exactByHash]]'s job.
    *
    * The distance kernel is [[LevBanded]] — a custom codegen expression
    * running the Ukkonen band (O(min(n,m)·maxDist) after a one-time
    * codepoint decode, early abandon when a whole row exceeds the band)
    * because the builtin's UTF8String.charAt is O(position) and
    * degenerates superlinearly on kilobyte texts (measured ~40×). It
    * returns −1 above the band, so the single `dist >= 1` filter is
    * exactly the oracle's BETWEEN 1 AND maxDist (one expression
    * reference — nothing for predicate pushdown to re-inline twice). */
  def editPairs(docs: DataFrame, maxDist: Int = 20,
                maxBlock: Int = 64): DataFrame =
    candidatePairs(docs, maxBlock)
      .withColumn("dist",
        LevBanded.levBanded(col("text_a"), col("text_b"), maxDist).cast("long"))
      .filter(col("dist") >= 1L)
      .withColumn("max_len",
        greatest(length(col("text_a")), length(col("text_b"))).cast("long"))
      .select(col("doc_a"), col("doc_b"), col("dist"),
        (lit(1000L) - expr("dist * 1000 DIV max_len")).as("sim_permille"))
}
