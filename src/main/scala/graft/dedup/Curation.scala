package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually ships: quality gate → language gate → exact dedup → MinHash-LSH
  * near-dup clusters → one keeper per cluster. Every input document gets a
  * verdict, so the kept corpus and each drop reason are one filter away.
  *
  * Scale design: the gates are per-row expression trees (no shuffle); exact
  * dedup is one hash-aggregate on the normalized text; the near-dup stage
  * sees only gate+exact survivors and pairs them through the LSH banding
  * equi-join (never all-pairs); cluster keepers come from iterative
  * min-label propagation over the verified pair graph. Each stage shrinks
  * the data for the next — the whole chain is linear in input size.
  */
object Curation {

  /** Exact-dedup key: the 128-bit content hash, not the normalized text —
    * the grouping exchange carries 32 chars per row (see Dedup.exactKeyHash). */
  private def norm = Dedup.exactKeyHash(col("text"))

  /** Verdict per document: kept | quality_<bucket> | lang | exact_dup |
    * near_dup. Drop order matches a real pipeline: cheap gates first, then
    * exact, then near-dup — a doc failing several stages reports the first. */
  def curate(docs: DataFrame, jaccardPermilleMin: Int = 600): DataFrame = {
    val qc = TextAnalysis.qualityColumns(col("text"))
    val gated = docs.select(col("doc_id"), col("text"),
      qc("quality_bucket").as("quality_bucket"),
      TextAnalysis.langId(col("text")).as("lang_pred"))
    val pass = gated
      .filter(col("quality_bucket") === "ok" && col("lang_pred") === "en")
    val normed = pass.select(col("doc_id"), col("text"), norm.as("norm"))
    val exactKeeper = normed.groupBy("norm")
      .agg(min(col("doc_id")).as("exact_keeper"))
    val withExact = normed.join(exactKeeper, "norm")
      .select(col("doc_id"), col("text"), col("exact_keeper"))
    // survivors feeds three consumers (LSH candidates + both sides of the
    // jaccard verify); persisted so the gate+exact chain — which re-reads
    // the FULL corpus — runs once, not three times. Locally this is
    // timing-neutral (the sketch stages dominate); at 100 TB it removes
    // two full-corpus re-scans. Blocks release via the ContextCleaner.
    val survivors = withExact.filter(col("doc_id") === col("exact_keeper"))
      .select("doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup.jaccardPermille(Dedup.lshCandidates(survivors), survivors)
      .filter(col("jaccard_permille") >= jaccardPermilleMin)
    val clusters = Dedup.duplicateClusters(pairs)
      .withColumnRenamed("keeper_id", "near_keeper")
    gated.select(col("doc_id"), col("quality_bucket"), col("lang_pred"))
      .join(withExact.select(col("doc_id"), col("exact_keeper")), Seq("doc_id"), "left")
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("quality_bucket") =!= "ok",
          concat(lit("quality_"), col("quality_bucket")))
          .when(col("lang_pred") =!= "en", lit("lang"))
          .when(col("exact_keeper") =!= col("doc_id"), lit("exact_dup"))
          .when(col("near_keeper").isNotNull &&
            col("near_keeper") =!= col("doc_id"), lit("near_dup"))
          .otherwise(lit("kept")).as("verdict"))
  }

  /** Incremental batch-vs-index dedup — the shape a production corpus
    * actually runs daily: verdict each NEW document against an EXISTING
    * corpus without re-processing history. The existing side participates
    * only through its md5 key set and its LSH band table
    * ([[Dedup.bandTable]]) — at 100 TB both are stored tables appended as
    * documents arrive, so the cost scales with the new batch (plus
    * equi-join probes), never with the corpus.
    *
    * Verdicts: exact_dup (content hash already present), near_dup
    * (shares an LSH band with an existing doc AND verifies ≥ threshold),
    * else new. Exact wins over near. */
  def incrementalVerdicts(newDocs: DataFrame, existing: DataFrame,
                          jaccardPermilleMin: Int = 600): DataFrame = {
    val newKeys = newDocs.select(col("doc_id"),
      Dedup.exactKeyHash(col("text")).as("h"))
    val oldKeys = existing.select(Dedup.exactKeyHash(col("text")).as("h"))
      .distinct()
    val exactDup = newKeys.join(oldKeys, Seq("h"), "left_semi")
      .select(col("doc_id")).withColumn("is_exact", lit(true))
    val candPairs = Dedup.bandTable(newDocs)
      .withColumnRenamed("doc_id", "doc_a")
      .join(Dedup.bandTable(existing).withColumnRenamed("doc_id", "doc_b"),
        Seq("band_idx", "band_sig"))
      .select("doc_a", "doc_b").distinct()
    val near = Dedup
      .jaccardPermille(candPairs, newDocs.unionByName(existing))
      .filter(col("jaccard_permille") >= jaccardPermilleMin)
      .select(col("doc_a").as("doc_id")).distinct()
      .withColumn("is_near", lit(true))
    newDocs.select(col("doc_id"))
      .join(exactDup, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_exact"), "exact_dup")
          .when(col("is_near"), "near_dup")
          .otherwise("new").as("verdict"))
  }
}
