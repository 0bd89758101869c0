package graft.dedup

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join with prefix filtering (the PPJoin
  * family) — the deterministic complement to MinHash+LSH (`Dedup`,
  * probabilistic recall) and blocked edit distance (`EditDedup`,
  * char-level): every pair of documents whose distinct-shingle-set Jaccard
  * is ≥ τ is found, with proof-backed pruning instead of sampling.
  *
  * Prefix-filter lemma: order all tokens by a GLOBAL rank (document
  * frequency ascending — rarest first — ties by token value). If
  * J(a,b) ≥ τ then the two sets share ≥ max(⌈τ|a|⌉, ⌈τ|b|⌉) tokens, and
  * any two sets sharing ≥ o tokens must collide inside their first
  * |x| − o + 1 tokens under the shared order. So joining only on each
  * doc's (|x| − ⌈τ|x|⌉ + 1)-prefix tokens is COMPLETE, and the rarest
  * tokens make the candidate join maximally selective.
  *
  * Scale notes:
  *  - The df table is vocabulary-sized; the per-doc rank is one window
  *    over the (doc_id)-keyed token stream — the same exchange the
  *    postings build (`Bm25.postings`) pays, and ~τ of each doc's tokens
  *    never enter the join.
  *  - The candidate join is keyed on single (rare) tokens; its skew bound
  *    is the largest prefix-token posting list. Stop-word-like tokens are
  *    by construction at the BACK of the order, so hot tokens only appear
  *    in prefixes of docs that consist almost entirely of hot tokens;
  *    residual hot buckets go to AQE skew-join like every LSH bucket.
  *  - Verify is exact Jaccard on candidates only, same formula as the
  *    MinHash verify stage (`Dedup.jaccardPermille`, q36 oracle).
  */
object SetSimJoin {

  /** Distinct 3-token-shingle rows (doc_id, tok) — shingles, not raw
    * tokens: the set domain every other dedup stage shares (q36/q56),
    * discriminative enough that the prefix join stays sparse even on
    * small-vocabulary corpora where raw token sets are near-universal. */
  def tokenRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array_distinct(Dedup.shingleHashes(col("text")))).as("tok"))

  /** Integer-exact prefix length for a set of size `sz` at threshold
    * τ = tauPermille/1000: sz − ⌈τ·sz⌉ + 1. */
  def prefixLen(sz: Column, tauPermille: Long): Column =
    sz - floor((sz * tauPermille + 999L) / 1000L).cast("long") + 1L

  /** Prefix-token rows: each doc's rarest (df asc, tok asc) tokens up to
    * its prefix length. */
  def prefixTokens(docs: DataFrame, tauPermille: Long): DataFrame = {
    val tok = tokenRows(docs)
    val dfT = tok.groupBy("tok").agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("doc_id")
      .orderBy(col("df").asc, col("tok").asc)
    tok.join(dfT, "tok")
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= prefixLen(col("sz"), tauPermille))
      .select("doc_id", "tok")
  }

  /** Complete candidate set: distinct (doc_a < doc_b) sharing ≥1 prefix
    * token. */
  def candidates(docs: DataFrame, tauPermille: Long): DataFrame = {
    val pref = prefixTokens(docs, tauPermille)
    pref.select(col("tok"), col("doc_id").as("doc_a"))
      .join(pref.select(col("tok"), col("doc_id").as("doc_b")), "tok")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** All pairs with distinct-token Jaccard ≥ τ (permille), exact:
    * (doc_a, doc_b, jaccard_permille). */
  def similarPairs(docs: DataFrame, tauPermille: Long = 600L): DataFrame = {
    val sets = docs.select(col("doc_id"),
      array_distinct(Dedup.shingleHashes(col("text"))).as("ts"))
    candidates(docs, tauPermille)
      .join(sets.select(col("doc_id").as("doc_a"), col("ts").as("ts_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("ts").as("ts_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("ts_a"), col("ts_b"))).cast("long"))
      .withColumn("uni", size(array_union(col("ts_a"), col("ts_b"))).cast("long"))
      .withColumn("jaccard_permille",
        floor(col("inter") * lit(1000.0) / col("uni")).cast("long"))
      .filter(col("jaccard_permille") >= tauPermille)
      .select("doc_a", "doc_b", "jaccard_permille")
  }
}
