package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw document
  * by how much its hashed n-gram feature distribution resembles a target
  * domain, then select the docs that look more target-like than the
  * corpus average. This is the standard pretraining-mixture step between
  * cleaning and sampling — the quality classifier's distribution-level
  * complement.
  *
  * Scale shape: features are token hashes folded into a FIXED number of
  * buckets, so the learned "model" is a ≤`buckets`-row table that
  * broadcasts no matter how big the corpus is. The corpus explodes to
  * (doc, bucket) instances exactly once per aggregate; bucket counts
  * reduce with map-side combine; the per-doc score is one broadcast probe
  * + one doc_id-keyed aggregation. Nothing corpus-sized is ever collected
  * or broadcast.
  *
  * All arithmetic is integer-exact (micro-ratios via IntegralDivide) so
  * the DuckDB oracle hash-matches bit-for-bit; true DSIR uses log-ratios
  * of smoothed n-gram probabilities — the dataflow is identical, the
  * per-bucket score function is the swappable part.
  */
object Selection {

  /** Per-document importance weight vs the `targetLang` slice.
    *
    * Per bucket b: ratio_micro(b) = 1e6·n_target(b) DIV n_raw(b) — the
    * target-vs-raw rate of that feature. Per doc: the sum and mean of its
    * token instances' ratios; `selected` when the doc's mean ratio beats
    * the corpus-wide target token share (docs more target-like than
    * average survive resampling).
    *
    * Output: (doc_id, lang, n_tokens, weight_sum, mean_weight_micro,
    * selected); zero-token docs keep weight 0 and are never selected. */
  def dsirWeights(docs: DataFrame, buckets: Int = 1024,
                  targetLang: String = "en"): DataFrame = {
    val inst = docs.select(col("doc_id"), col("lang"),
        explode(TextAnalysis.tokHashes(col("text"))).as("h"))
      .withColumn("b", col("h") % buckets)
    // feature table: ≤`buckets` rows regardless of corpus size
    val rates = inst.groupBy("b").agg(
        count(lit(1)).as("n_raw"),
        sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("n_target"))
      .withColumn("ratio_micro", expr("n_target * 1000000 DIV n_raw"))
    // corpus-wide target share: the selection threshold (1-row frame)
    val thr = inst.agg(
      expr("sum(CASE WHEN lang = '" + targetLang +
        "' THEN 1 ELSE 0 END) * 1000000 DIV count(1)").as("share_micro"))
    val scored = inst
      .join(broadcast(rates.select("b", "ratio_micro")), Seq("b"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        sum("ratio_micro").as("weight_sum"))
      .withColumn("mean_weight_micro", expr("weight_sum DIV n_tokens"))
    docs.select("doc_id", "lang")
      .join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(thr))
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("weight_sum"), lit(0L)).as("weight_sum"),
        coalesce(col("mean_weight_micro"), lit(0L)).as("mean_weight_micro"),
        (coalesce(col("mean_weight_micro"), lit(0L)) >= col("share_micro"))
          .as("selected"))
  }
}
