package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality signals (the Gopher/C4-style "rep" filters):
  * top-token share and duplicate-bigram fraction. Boilerplate and
  * low-quality machine-generated text score high on both; real prose is
  * low. Pure per-row expression trees over the token-hash array — no
  * shuffle, no UDF; at 100 TB the cost is one map pass that fuses into the
  * scan's WholeStageCodegen span.
  *
  * Determinism contract: every ratio is a floored permille over long
  * counts, so Spark and DuckDB agree bit-for-bit (no raw-double output).
  */
object Repetition {

  import TextAnalysis.P

  /** Bigram hashes over an already-materialized token-hash array `th`:
    * (th(i)*31 + th(i+1)) mod P. Guarded — Spark's `sequence(1, 0)` counts
    * DOWN, so the n<2 case must short-circuit to an empty array. */
  def bigramHashes(th: Column): Column =
    when(size(th) >= 2,
      transform(sequence(lit(1), size(th) - 1),
        i => (element_at(th, i) * 31L + element_at(th, i + 1)) % P))
      .otherwise(array().cast("array<bigint>"))

  /** Token window for the quadratic top-token scan: distinct×all is
    * O(L²) per row, so a pathological 1M-token document would cost 1e12
    * comparisons. The signal saturates long before that — the first 4096
    * tokens bound the cost at ~16M ops worst case. */
  val TopTokenWindow = 4096

  /** Highest single-token occurrence count over the capped window. */
  def topTokenCount(th: Column): Column = {
    val w = slice(th, 1, TopTokenWindow)
    coalesce(
      array_max(transform(array_distinct(w),
        d => size(filter(w, x => x === d)).cast("long"))),
      lit(0L))
  }

  private def permille(num: Column, den: Column): Column =
    when(den > 0, floor(num.cast("double") * 1000.0 / den.cast("double"))
      .cast("long")).otherwise(0L)

  /** Per-document repetition signals:
    *  - top_token_permille: share of the most frequent token;
    *  - dup_bigram_permille: fraction of bigrams that are repeats.
    */
  def signals(docs: DataFrame): DataFrame = {
    // Two-projection split: materialize th once (CollapseProject would
    // otherwise inline the token hashing into each consumer).
    val withTh = docs.select(col("doc_id"),
      TextAnalysis.tokHashes(col("text")).as("th"))
    val withBi = withTh.select(col("doc_id"), col("th"),
      bigramHashes(col("th")).as("bi"))
    withBi.select(
      col("doc_id"),
      size(col("th")).cast("long").as("n_tokens"),
      // share measured within the same capped window as the count
      permille(topTokenCount(col("th")),
        least(size(col("th")), lit(TopTokenWindow)).cast("long"))
        .as("top_token_permille"),
      permille(
        (size(col("bi")) - size(array_distinct(col("bi")))).cast("long"),
        size(col("bi")).cast("long")).as("dup_bigram_permille"))
  }
}
