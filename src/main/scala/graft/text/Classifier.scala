package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear text-classifier INFERENCE — the fasttext-style quality-filter
  * shape: a document's score is the sum of per-token weights looked up by
  * token hash, normalized by length into a logit, thresholded into a
  * keep/drop label. At 100 TB classifier inference must be a map-only
  * expression pass (no shuffle, no UDF, weights effectively broadcast) —
  * exactly what this is; the real system swaps the weight function for a
  * trained table, the dataflow is identical.
  *
  * Weights here are a fixed deterministic function of the hash
  * (w(h) = h mod 2001 − 1000 ∈ [−1000, 1000]) so both engines share one
  * definition; all arithmetic is integer-exact except the final logit
  * division (IEEE double over exact integers, then floor).
  */
object Classifier {

  def weight(h: Column): Column = (h % 2001L) - 1000L

  /** (doc_id, n_tokens, score_sum, logit_x1e3, keep). */
  def score(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextAnalysis.tokHashes(col("text")).as("th"))
      .select(col("doc_id"), size(col("th")).cast("long").as("n_tokens"),
        aggregate(col("th"), lit(0L), (acc, h) => acc + weight(h)).as("score_sum"))
      .withColumn("logit_x1e3",
        when(col("n_tokens") > 0,
          floor(col("score_sum") * lit(1000.0) / col("n_tokens")).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("keep",
        when(col("logit_x1e3") >= 0, lit(1L)).otherwise(lit(0L)))
}
