package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk step that turns a document
  * corpus into fixed-token-budget training sequences. Documents are laid
  * end-to-end in a deterministic order and each is tagged with the pack
  * (sequence) it STARTS in and its offset there.
  *
  * Scale design: a single global running sum would serialize on one
  * partition, so the corpus is packed per (lang, shard) group with
  * shard = doc_id mod `shards` — the window shuffle then spreads over
  * lang×shards partitions, and `shards` scales with the cluster (each
  * group packs independently, which is exactly how multi-worker training
  * data is sharded in practice). Token counts are longs and offsets are
  * integer arithmetic — bit-stable across engines.
  */
object Packing {

  /** Per-document pack assignment: (lang, shard, pack_idx, pack_offset).
    * pack_idx is the zero-based sequence the document's first token lands
    * in; pack_offset its position inside that sequence. */
  def pack(docs: DataFrame, budgetTokens: Int = 256, shards: Int = 8): DataFrame = {
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
    docs
      .select(col("doc_id"), col("lang"),
        (col("doc_id") % shards).as("shard"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tokens"),
        floor(col("start_tok").cast("double") / budgetTokens).cast("long")
          .as("pack_idx"),
        (col("start_tok") % budgetTokens).as("pack_offset"))
  }

  /** Content-defined chunking (Rabin/rolling-hash CDC): chunk boundaries
    * fall where the rolling char-5-gram hash ≡ 0 (mod `modulus`), so
    * boundaries depend only on LOCAL content — an insertion early in a
    * document shifts only the chunk it lands in, which is what makes
    * chunk-level dedup stable under edits (the storage-dedup property,
    * here applied to corpus near-versioning). Reports per doc the chunk
    * count and mean chunk length (×1e3, integer-exact).
    *
    * Scale: ONE fused static-call pass off the scan
    * ([[graft.dedup.CdcBoundaries]] — counts chars + hash≡0 boundaries
    * without materializing the hash array; the interpreted per-window
    * fold it replaced was a measured 552 s at sf1), no shuffle, no UDF;
    * the 100 TB cost is the scan itself. [[cdcStatsDeclarative]] keeps
    * the HOF form as the parity contract (CharNgramParitySpec). */
  def cdcStats(docs: DataFrame, modulus: Int = 64, n: Int = 5): DataFrame =
    cdcFinish(docs.select(col("doc_id"),
      graft.dedup.CdcBoundaries.stats(col("text"), n, modulus).as("_c"))
      .select(col("doc_id"), col("_c.n_chars").as("n_chars"),
        col("_c.n_boundaries").as("n_boundaries")))

  /** Declarative reference for [[cdcStats]] (interpreted HOF tree). */
  def cdcStatsDeclarative(docs: DataFrame, modulus: Int = 64,
                          n: Int = 5): DataFrame = {
    val norm = regexp_replace(lower(col("text")), "\\s+", " ")
    val codes = transform(split(norm, ""), c => ascii(c).cast("long"))
    val m = size(codes)
    val starts = when(m >= n, sequence(lit(1), m - (n - 1)))
      .otherwise(array().cast("array<int>"))
    val hashes = transform(starts, i =>
      aggregate(slice(codes, i, lit(n)), lit(7L), (acc, x) => (acc * 31L + x) % graft.text.TextAnalysis.P))
    // n_chars from length(norm), not size(codes): splitting "" by "" yields
    // [""] (size 1) in Spark, so the array size over-counts the empty doc
    cdcFinish(docs.select(col("doc_id"), length(norm).cast("long").as("n_chars"),
      size(filter(hashes, h => h % modulus === 0)).cast("long").as("n_boundaries")))
  }

  private def cdcFinish(base: DataFrame): DataFrame =
    base.select(col("doc_id"), col("n_chars"), col("n_boundaries"),
        when(col("n_chars") > 0, col("n_boundaries") + 1).otherwise(lit(0L))
          .as("n_chunks"))
      .withColumn("mean_chunk_len_x1e3",
        when(col("n_chunks") > 0,
          floor(col("n_chars") * lit(1000.0) / col("n_chunks")).cast("long"))
          .otherwise(lit(0L)))

  /** Length-bucketed batch assembly: group documents into power-of-two
    * token-length buckets, then form fixed-size batches inside each bucket
    * ordered by (n_tokens, doc_id) — the padding-minimizing batching step
    * for variable-length training (batchmates have similar lengths, so
    * pad-to-max waste stays low). Reports per-batch padding efficiency
    * `floor(1000·Σtokens / (n·max_tokens))` permille.
    *
    * Scale design: like [[pack]], the window runs per (bucket, shard) with
    * shard = doc_id mod `shards`, so no global sort and the shuffle spreads
    * over buckets×shards partitions that scale with the cluster. All
    * arithmetic is integer-exact.
    */
  def lengthBuckets(docs: DataFrame, batchSize: Int = 16,
                    shards: Int = 8): DataFrame = {
    val n = size(TextAnalysis.tokens(col("text"))).cast("long")
    val bucket = when(n < 16, 0L).when(n < 32, 1L).when(n < 64, 2L)
      .when(n < 128, 3L).when(n < 256, 4L).when(n < 512, 5L)
      .when(n < 1024, 6L).otherwise(7L)
    val w = Window.partitionBy("bucket", "shard").orderBy("n_tokens", "doc_id")
    docs
      .select(col("doc_id"), n.as("n_tokens"), bucket.as("bucket"),
        (col("doc_id") % shards).as("shard"))
      .withColumn("batch_id",
        floor((row_number().over(w) - 1).cast("double") / batchSize).cast("long"))
      .groupBy("bucket", "shard", "batch_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
        max("n_tokens").as("max_tokens"))
      .withColumn("pad_eff_permille",
        when(col("max_tokens") > 0,
          floor(col("sum_tokens") * lit(1000.0) / (col("n_docs") * col("max_tokens")))
            .cast("long"))
          .otherwise(lit(1000L)))
  }

  /** Sliding-window chunk spans: each document yields chunks of
    * `chunkTokens` tokens starting every `stride` tokens (overlap =
    * chunk − stride), the long-context splitting step. Pure per-row
    * explode — no shuffle, and chunk counts are exact integer arithmetic
    * on both engines. */
  def chunkSpans(docs: DataFrame, chunkTokens: Int = 128,
                 stride: Int = 96): DataFrame = {
    val n = size(TextAnalysis.tokens(col("text"))).cast("long")
    val nChunks = when(n <= chunkTokens, lit(1L)).otherwise(
      lit(1L) + floor((n - chunkTokens + stride - 1).cast("double") / stride)
        .cast("long"))
    docs.select(col("doc_id"), n.as("n_tokens"), nChunks.as("n_chunks"))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(col("doc_id"), col("n_tokens"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("tok_start"),
        least(col("chunk_idx") * stride + chunkTokens, col("n_tokens"))
          .as("tok_end"))
  }
}
