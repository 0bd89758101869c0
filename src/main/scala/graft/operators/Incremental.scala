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
}
