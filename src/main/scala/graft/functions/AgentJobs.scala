package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The agent-job history path (E13/S3, `pkg/app/process_agent.go:43-372`),
  * re-expressed over the events table: run_status → (text, severity) 6-arm
  * map, run_date+run_time integers → timestamp via make_timestamp +
  * to_utc_timestamp, job/step classification and description.
  */
object AgentJobs {

  /** run_status → text (`pkg/app/process_agent.go:222-247`). */
  def runStatusText(st: Column): Column =
    when(st === 0, "Failed").when(st === 1, "Succeeded")
      .when(st === 2, "Retry").when(st === 3, "Cancelled")
      .when(st === 4, "In Progress").otherwise("Unknown")

  /** run_status → severity: failed/retry/cancelled are errors. */
  def runStatusSeverity(st: Column): Column =
    when(st.isin(0, 2, 3), 3).otherwise(6)

  /** run_date (yyyymmdd int) + run_time (hhmmss int) → UTC timestamp
    * (`pkg/app/process_agent.go:126-145`). */
  def runTimestamp(runDate: Column, runTime: Column): Column =
    to_utc_timestamp(
      make_timestamp(
        (runDate / 10000L).cast("int"),
        ((runDate % 10000L) / 100L).cast("int"),
        (runDate % 100L).cast("int"),
        (runTime / 10000L).cast("int"),
        ((runTime % 10000L) / 100L).cast("int"),
        (runTime % 100L).cast("int").cast("decimal(8,6)")),
      "UTC")

  /** F6: jobs-mode gate — `all` keeps everything, `failed` keeps
    * {0,2,3}, `none` drops all (`pkg/app/process_agent.go:277-278`). */
  def jobsModeGate(mode: String): Column = mode match {
    case "all"    => lit(true)
    case "failed" => col("run_status").isin(0, 2, 3)
    case _        => lit(false)
  }

  /** Derive a job-history-shaped frame (the sysjobhistory analog) from the
    * events table: the event's k drives deterministic run_date/run_time/
    * status; step 0 = job outcome, steps >0 = job steps
    * (`process_agent.go:111-156`). Carries job_id only — names come from
    * the jobs dimension via [[withJobNames]]. */
  def fromEvents(events: DataFrame): DataFrame = {
    val k = regexp_extract(col("props"), "[0-9]+", 0).cast("long")
    events.select(
      col("event_id").as("instance_id"),
      (col("user_id") % 10L).as("job_id"),
      (k % 5L).cast("int").as("step_id"),
      (k % 6L).cast("int").as("run_status"),
      (lit(20240101L) + k % 28L).as("run_date"),
      (k % 24L * 10000L + k % 60L * 100L + k % 60L).as("run_time"))
  }

  /** The sysjobs dimension: job_id → job_name. */
  def jobsDim(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (0L until 10L).map(i => (i, s"job_$i")).toDF("job_id", "job_name")
  }

  /** J6: sysjobhistory ⋈ sysjobs equi-join on job_id
    * (`pkg/app/process_agent.go:133-134`) — broadcast, the dim is tiny. */
  def withJobNames(history: DataFrame, spark: org.apache.spark.sql.SparkSession): DataFrame =
    history.join(broadcast(jobsDim(spark)), Seq("job_id"), "left")

  /** Full enrichment: classification, status text/severity, timestamp,
    * description (`process_agent.go:213-274`). */
  def enrich(jobs: DataFrame): DataFrame =
    jobs
      .withColumn("name",
        when(col("step_id") === 0, "agent_job").otherwise("agent_job_step"))
      .withColumn("run_status_text", runStatusText(col("run_status")))
      .withColumn("xe_severity_value", runStatusSeverity(col("run_status")))
      .withColumn("run_ts", runTimestamp(col("run_date"), col("run_time")))
      .withColumn("xe_category", lit("agent"))
      .withColumn("xe_description",
        when(col("step_id") === 0,
          concat(col("job_name"), lit(": "), col("run_status_text")))
          .otherwise(concat(col("job_name"), lit(": [step "), col("step_id"),
            lit("] "), col("run_status_text"))))
}
