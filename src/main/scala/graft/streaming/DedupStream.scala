package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Streaming exact dedup — the continuous twin of Dedup.exactByHash: an
  * unbounded document stream keeps only the FIRST arrival of each
  * normalized-content hash.
  *
  * Two state regimes, both on the md5 content key (32 chars per state
  * entry, never the document text):
  *  - unbounded: `dropDuplicates` — state grows with distinct corpus size;
  *    right when the corpus fits state-store budgets (RocksDB at scale).
  *  - watermarked: `dropDuplicatesWithinWatermark` — duplicates are only
  *    suppressed within the watermark horizon and state is evicted behind
  *    it; right for endless feeds where re-crawls arrive close together.
  */
object DedupStream {

  /** First arrival per content hash, unbounded state. */
  def distinctDocs(docStream: DataFrame): DataFrame =
    docStream
      .withColumn("norm_h", Dedup.exactKeyHash(col("text")))
      .dropDuplicates("norm_h")

  /** First arrival per content hash within the event-time watermark;
    * state behind the watermark is evicted. `ts` must be the stream's
    * event-time column. */
  def distinctDocsWithinWatermark(docStream: DataFrame,
                                  delay: String = "1 hour"): DataFrame =
    docStream
      .withColumn("norm_h", Dedup.exactKeyHash(col("text")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("norm_h")
}
