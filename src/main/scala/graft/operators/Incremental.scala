package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-scan operators: the reset/catch-up re-scan and watermark
  * cursor semantics of the reference.
  */
object Incremental {

  /** S2: catch-up re-scan after an invalid offset — re-read from the start
    * but skip rows at or before the saved cursor:
    * `fileName < last` dropped; `fileName == last && offset <= lastOffset`
    * dropped (`pkg/app/process_session.go:128-135`). A plain predicate —
    * pushed to the scan, prunes whole files via parquet min/max. */
  def afterCursor(lastFile: String, lastOffset: Long): Column =
    col("src_file") > lit(lastFile) ||
      (col("src_file") === lit(lastFile) && col("src_offset") > lit(lastOffset))

  def catchUp(df: DataFrame, lastFile: String, lastOffset: Long): DataFrame =
    df.filter(afterCursor(lastFile, lastOffset))

  /** W2/A7: the new cursor after a batch — max (file, offset) seen
    * (`pkg/app/process_session.go:137-177`). */
  def nextCursor(df: DataFrame): DataFrame =
    df.agg(max(struct(col("src_file"), col("src_offset"))).as("cursor"))
      .select(col("cursor.src_file").as("last_file"),
        col("cursor.src_offset").as("last_offset"))

  /** S3: incremental-by-key scan (`instance_id > ?` analog,
    * `pkg/app/process_agent.go:111-156`): rows strictly after a watermark
    * on a monotone key. */
  def afterWatermark(df: DataFrame, key: String, watermark: Long): DataFrame =
    df.filter(col(key) > watermark)

  /** MERGE-style latest-wins upsert: fold a change batch into a base
    * snapshot, keeping ONE row per key — the highest `versionCols` wins,
    * and on an exact version tie the change side beats the base (the
    * idempotent re-apply case). Unmatched base rows pass through and
    * change rows for new keys insert, both for free — the union feeds one
    * hash-aggregate.
    *
    * Scale shape: no join and no window. A join-based MERGE shuffles both
    * sides AND the output; a window (`row_number() over key order by
    * version desc`) shuffles everything and sorts within partitions while
    * keeping every duplicate row alive until the filter. The
    * `max_by(payload, version)` aggregate instead combines map-side — at
    * 100 TB each executor reduces its local duplicates before anything
    * crosses the network, and the single shuffle carries only surviving
    * candidates. */
  def upsert(base: DataFrame, changes: DataFrame,
             keyCols: Seq[String], versionCols: Seq[String]): DataFrame = {
    val payload = base.columns.toSeq
    val tagged = base.withColumn("_src_pri", lit(0))
      .unionByName(changes.withColumn("_src_pri", lit(1)))
    val version = struct((versionCols :+ "_src_pri").map(col): _*)
    tagged
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), version).as("w"))
      .select(payload.map(c => col(s"w.$c").as(c)): _*)
  }
}
