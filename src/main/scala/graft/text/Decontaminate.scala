package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Benchmark decontamination — flag training documents that share n-gram
  * shingles with an evaluation set, the step every serious corpus build
  * runs before training.
  *
  * Scale shape: the benchmark side is tiny (eval suites are thousands of
  * documents against a corpus of billions), so its DISTINCT shingle set
  * broadcasts; the corpus side explodes to (doc_id, shingle) and probes
  * the broadcast hash join — the corpus is never shuffled for matching,
  * and only MATCHING rows (a sliver) reach the per-document count
  * aggregation. The final flag joins back on doc_id.
  */
object Decontaminate {

  /** Per-document overlap count and contamination flag. The benchmark set
    * here is the deterministic doc_id mod `benchMod` stratum (callers pass
    * a real eval table at deployment); benchmark members themselves are
    * never flagged. */
  def flags(docs: DataFrame, benchMod: Int = 97, minShingles: Int = 3): DataFrame = {
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(Dedup.shingleHashes(col("text")))).as("sh"))
    val bench = sh.filter(col("doc_id") % benchMod === 0)
      .select(col("sh").as("bsh")).distinct()
    val matched = sh.join(broadcast(bench), col("sh") === col("bsh"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    docs.select(col("doc_id"))
      .join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) >= minShingles &&
          col("doc_id") % benchMod =!= 0).as("contaminated"))
  }

  /** Contamination SPAN report — where in each flagged document the eval
    * overlap sits, not just that it exists (the evidence a removal/redact
    * decision needs: a quote inside a long doc can be excised; a doc that
    * IS the benchmark answer gets dropped).
    *
    * Per matching non-benchmark doc: matched shingle-instance count,
    * first/last matching shingle position, the token span those bound
    * (3-token shingles → last − first + 3), and the matched fraction of
    * the doc's shingles in permille.
    *
    * Same scale shape as [[flags]]: the benchmark shingle set broadcasts,
    * the corpus posexplodes and probes it map-side, and only MATCHING
    * instances (a sliver) reach the per-doc aggregation. */
  def spans(docs: DataFrame, benchMod: Int = 97): DataFrame = {
    val sh = docs
      .select(col("doc_id"), Dedup.shingleHashes(col("text")).as("arr"))
      .select(col("doc_id"), size(col("arr")).cast("long").as("n_shingles"),
        posexplode(col("arr")).as(Seq("pos", "sh")))
    val bench = sh.filter(col("doc_id") % benchMod === 0)
      .select(col("sh").as("bsh")).distinct()
    sh.filter(col("doc_id") % benchMod =!= 0)
      .join(broadcast(bench), col("sh") === col("bsh"))
      .groupBy("doc_id").agg(
        max("n_shingles").as("n_shingles"),
        count(lit(1)).as("n_matched"),
        min("pos").cast("long").as("first_pos"),
        max("pos").cast("long").as("last_pos"))
      .withColumn("span_tokens", col("last_pos") - col("first_pos") + 3)
      .withColumn("matched_permille", expr("n_matched * 1000 DIV n_shingles"))
  }

  /** FUZZY decontamination — MinHash/LSH-band match against the eval set,
    * catching paraphrased or lightly-edited benchmark leakage that the
    * exact-shingle probe of [[flags]] misses (an eval answer with two
    * words changed shares few 3-token shingles but still collides on LSH
    * bands with high probability at Jaccard ≳ 0.6).
    *
    * Per non-benchmark document: how many of its `NumHashes/2` LSH bands
    * collide with ANY benchmark document's band, flagged at `minBands`.
    * Band-level match, not pair-level: we never enumerate (train, eval)
    * pairs, so a benchmark answer duplicated across thousands of training
    * docs costs the same as one.
    *
    * Scale shape: signatures are the fused one-pass sketch expression (no
    * shuffle); the eval side's DISTINCT (band_idx, band_sig) set is tiny
    * (4 rows per eval doc) and broadcasts; the corpus probes it map-side
    * and only COLLIDING band rows (a sliver) reach the per-doc count.
    * The corpus is never shuffled. */
  def fuzzyFlags(docs: DataFrame, benchMod: Int = 97,
                 minBands: Int = 2): DataFrame = {
    val bands = Dedup.bandTable(docs)
    val benchBands = bands.filter(col("doc_id") % benchMod === 0)
      .select(col("band_idx").as("b_idx"), col("band_sig").as("b_sig"))
      .distinct()
    val matched = bands.filter(col("doc_id") % benchMod =!= 0)
      .join(broadcast(benchBands),
        col("band_idx") === col("b_idx") && col("band_sig") === col("b_sig"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_bands_matched"))
    docs.select(col("doc_id"))
      .join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bands_matched"), lit(0L)).as("n_bands_matched"),
        (coalesce(col("n_bands_matched"), lit(0L)) >= minBands &&
          col("doc_id") % benchMod =!= 0).as("fuzzy_contaminated"))
  }
}
