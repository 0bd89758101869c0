package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.7): per-group counters (A2/A3),
  * summary stats (A4), rolling time-bucket metrics (A5/W3), sampler (A8),
  * and the lineage/checkpoint fold (A7). All are plain hash aggregates —
  * map-side partial + final after shuffle comes free from Catalyst.
  */
object Aggregates {

  /** A2: per-(event, role) read counters + byte sums — the labeled counter
    * analog (`pkg/prom/prom.go:11-41`). */
  def perEventCounters(df: DataFrame): DataFrame =
    df.groupBy("name", "role")
      .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("bytes"))

  /** A4: summary per event type: count, sum/max of size
    * (`pkg/summary/summary.go:36-53`). */
  def summary(df: DataFrame): DataFrame =
    df.groupBy("name").agg(
      count(lit(1)).as("n"),
      sum(length(col("text"))).as("sum_bytes"),
      max(length(col("text"))).as("max_bytes"))

  /** A5/W3: hourly time-bucket metrics (`pkg/metric/metric.go:35-113`;
    * rotator hourly buckets `pkg/sink/rotator.go:132-137`). */
  def hourly(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour").as("w"), col("name"))
      .agg(count(lit(1)).as("n"),
        sum(col("duration")).as("sum_duration"),
        max(col("severity_num")).as("max_severity"))
      .select(col("w.start").as("hour_start"), col("name"),
        col("n"), col("sum_duration"), col("max_severity"))

  /** A5 sliding variant: 2-hour windows sliding by 1 hour — every event
    * lands in two windows (`pkg/metric/metric.go:66-95` frame semantics). */
  def slidingCounts(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("name"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("name"), col("n"))

  /** A8: sampler — first event per (name, duration bucket); the bucket
    * duration is configurable like the reference's per-arbitrary-duration
    * sampling (`pkg/sink/sampler/sampler.go:51-89`). `duration` takes any
    * date_trunc unit ("minute", "hour", "day", ...). */
  def sampler(df: DataFrame, duration: String = "hour"): DataFrame = {
    val bucket = date_trunc(duration, col("ts"))
    val w = Window.partitionBy(col("name"), bucket)
      .orderBy(col("ts"), col("conv_id"), col("turn_idx"))
    df.withColumn("bucket", bucket)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("name"), col("bucket"), col("conv_id"), col("turn_idx"))
  }

  /** Read the lineage table effectively-once: sink writes are
    * at-least-once on crash-replay (ST2), so a batch may append duplicate
    * lineage rows; keep one row per (batch_id, src_file). */
  def lineageDeduped(lineage: DataFrame): DataFrame =
    lineage.dropDuplicates("batch_id", "src_file")

  /** Field-coverage profile over the PARSED frame — the schema-drift
    * monitor a long-running log pipeline needs: per event name, how often
    * each key extracted field is actually present (permille). A feed
    * whose `duration` coverage collapses for `wait_info` is emitting a
    * changed payload shape; this catches it before the enrichment arms
    * silently start producing nulls. One hash-agg on the (small) name
    * key; all rates are integer permille. */
  val CoverageFields: Seq[String] = Seq("error_number", "duration",
    "principal", "client_addr", "wait_type", "db_id")
  def fieldCoverage(parsed: DataFrame): DataFrame = {
    val rates = CoverageFields.map { f =>
      floor(sum(when(col(f).isNotNull, 1L).otherwise(0L)) * lit(1000.0)
        / count(lit(1))).cast("long").as(s"${f}_permille")
    }
    parsed.groupBy("name")
      .agg(count(lit(1)).as("n_events"), rates: _*)
  }

  /** A7/E11: lineage fold — max/min offset + count per source file, the
    * `(file, offset, status)` checkpoint analog
    * (`pkg/app/process_session.go:137-177`; `pkg/status/status.go:273-297`). */
  def lineage(df: DataFrame): DataFrame =
    df.groupBy("src_file").agg(
      min(col("src_offset")).as("min_offset"),
      max(col("src_offset")).as("max_offset"),
      count(lit(1)).as("n_events"))
}
