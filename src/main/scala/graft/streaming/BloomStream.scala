package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Sketches

/** Continuous Bloom prefilter — the streaming twin of
  * [[Sketches.bloomPrefilter]] (q149), and the payoff of the word table
  * being MERGEABLE: per micro-batch, probe the incoming documents against
  * the filter accumulated from every previous batch, emit per-doc
  * verdicts, then `bit_or`-fold the batch's own shingles into the stored
  * table. The only cross-batch state is the ≤8 KB word table — constant
  * regardless of how many documents have streamed past — so the
  * dedup-prescreen keeps working after a restart, across shards (merge
  * the shard tables), and at any history length, where a key-set state
  * store would grow without bound.
  *
  * Same alternating-directory + pointer-flip discipline as
  * [[SnapshotStream]]: readers never see a half-written table, and a
  * batch retried after the pointer flip is skipped (already applied —
  * and re-merging would anyway be idempotent: bit_or is).
  */
object BloomStream {

  def currentDir(root: String): Option[String] = {
    val ptr = new java.io.File(s"$root/CURRENT")
    if (ptr.exists()) Some(java.nio.file.Files.readString(ptr.toPath).trim)
    else None
  }

  /** The live word table; empty (0-row) frame before the first commit. */
  def wordTable(spark: SparkSession, root: String): DataFrame =
    currentDir(root) match {
      case Some(d) => spark.read.parquet(d)
      case None =>
        spark.range(0).select(col("id").as("word"), col("id").as("bits"))
    }

  /** Start the continuous prefilter over a document stream (doc_id, text).
    * Verdicts append to `root/verdicts`; the filter lives under `root`.
    * On a retry that died between the verdict append and the pointer
    * flip, verdicts are at-least-once (dedupe downstream on
    * (batch_id, doc_id) if the sink needs exactly-once); the FILTER state
    * itself is exactly-once via the pointer — and even a double merge
    * would be harmless, bit_or being idempotent. */
  def start(docs: DataFrame, root: String, checkpoint: String,
            minShingles: Int = 3): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val next = s"$root/bloom_${batchId % 2}"
        if (!currentDir(root).contains(next)) {
          val sh = batch.select(col("doc_id"),
            explode(array_distinct(
              graft.dedup.Dedup.shingleHashes(col("text")))).as("sh"))
            .withColumn("key", col("sh").cast("string"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val stored = wordTable(spark, root)
          val verdicts = Sketches.bloomProbe(sh, "key",
              Sketches.bloomRow(stored))
            .groupBy("doc_id").agg(
              count(lit(1)).as("n_shingles"),
              sum(when(col("maybe_member"), 1L).otherwise(0L)).as("n_maybe"))
            .withColumn("needs_verify", col("n_maybe") >= minShingles)
            .withColumn("batch_id", lit(batchId))
          verdicts.write.mode("append").parquet(s"$root/verdicts")
          val merged = Sketches.bloomMerge(stored,
            Sketches.bloomWordTable(sh, "key"))
          merged.write.mode("overwrite").parquet(next)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$root/CURRENT"), next)
          sh.unpersist()
          ()
        }
      }
      .start()
}
