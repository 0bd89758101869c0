package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Lookups

/** Enrichment stage: the ~15 derived `xe_*` fields computed inside the
  * reference's `Parse` (`pkg/xe/xe.go:194-251`), re-expressed as pure
  * `Column` expressions plus broadcast lookup joins. All of it stays inside
  * WholeStageCodegen; joins are broadcast (dims ≪ 1 MB) so no shuffle is
  * introduced by enrichment at any scale.
  */
object Enrich {

  // ---- E1: severity (pkg/xe/xe.go:433-469) ---------------------------------
  /** error_reported sev>=11 → 3 (err); errorlog Logon parse sev>=11 → 3;
    * waits / blocked → 4 (warning); else 6 (info). */
  def severityValue: Column =
    when(col("name") === "error_reported" && col("severity_num") >= 11, 3)
      .when(col("name") === "errorlog_written" && col("severity_num") >= 11, 3)
      .when(col("name") === "wait_info", 4)
      .otherwise(6)

  /** 3→"err", 4→"warning", 6→"info" (pkg/logstash/logstash.go:21-28). */
  def severityKeyword(sev: Column): Column =
    when(sev === 3, "err").when(sev === 4, "warning").otherwise("info")

  // ---- E2: category (pkg/xe/xe.go:473-489) ---------------------------------
  def category: Column =
    when(col("name") === "sql_batch_completed", "tsql")
      .when(col("name") === "wait_info", "wait")
      .otherwise(col("name"))

  // ---- humanizers (pkg/xe/xe.go:939-984 roundDuration; :744-771 bytes) -----
  /** Duration pretty-print from microseconds: h+m / m+s / s / ms / us. */
  def humanDurationUs(us: Column): Column = {
    val s = (us / 1000000L).cast("long")
    when(us >= 3600L * 1000000L,
      concat((s / 3600L).cast("long"), lit("h"), ((s % 3600L) / 60L).cast("long"), lit("m")))
      .when(us >= 60L * 1000000L,
        concat((s / 60L).cast("long"), lit("m"), (s % 60L).cast("long"), lit("s")))
      .when(us >= 1000000L, concat(s, lit("s")))
      .when(us >= 1000L, concat((us / 1000L).cast("long"), lit("ms")))
      .otherwise(concat(us, lit("us")))
  }

  /** Pages (8 KB) → "N MB" when >=128 pages else "N KB"
    * (pkg/xe/xe.go:660-668 kbtombstring adaptation). */
  def pagesHuman(pages: Column): Column =
    when(pages >= 128L, concat((pages / 128L).cast("long"), lit(" MB")))
      .otherwise(concat(pages * 8L, lit(" KB")))

  // ---- E3: description templates (pkg/xe/xe.go:492-656) --------------------
  def description: Column = {
    // concat (not concat_ws): a NULL principal must propagate to a NULL
    // description, matching the oracle's null-propagating `||`
    val loginDesc = concat(lit("Login: "), col("principal"),
      when(col("host_name").isNotNull, concat(lit(" from "), col("host_name"))).otherwise(lit("")),
      when(col("app_name").isNotNull, concat(lit(" using "), col("app_name"))).otherwise(lit("")))
    val errDesc = concat(lit("(Msg "), col("error_number"), lit(", Level "),
      col("severity_num"), lit(", State "), col("state_num"), lit(") "),
      Grok.left(col("body"), 300))
    val sqlDesc = concat(lit("(CPU: "), (col("cpu_time") / 1000L).cast("long"),
      lit("ms; L: "), pagesHuman(col("logical_reads")),
      lit("; W: "), pagesHuman(col("writes")), lit(") "),
      Grok.left(col("batch_text"), 300))
    val waitDesc = concat(lit("("), humanDurationUs(col("duration")), lit(") "),
      col("wait_type"))
    when(col("name") === "login", loginDesc)
      .when(col("name") === "error_reported", errDesc)
      .when(col("name") === "sql_batch_completed", sqlDesc)
      .when(col("name") === "wait_info", waitDesc)
      .when(col("name") === "errorlog_written", Grok.left(col("errorlog_message"), 300))
      .otherwise(Grok.left(col("body"), 300))
  }

  // ---- E4: xe_acct_app / xe_acct_app_client (pkg/xe/xe.go:865-898) ---------
  def acctApp: Column =
    when(col("principal").isNotNull && col("app_name").isNotNull,
      concat(col("principal"), lit(" - "), col("app_name")))
      .when(col("principal").isNotNull, col("principal"))
      .otherwise(col("app_name"))

  def acctAppClient: Column =
    when(col("host_name").isNotNull && acctApp.isNotNull,
      concat(acctApp, lit(" ("), col("host_name"), lit(")")))
      .otherwise(acctApp)

  // ---- E12: gated unit conversions (pkg/xe/xe_units.go:5-36) ---------------
  def withUnits(df: DataFrame): DataFrame = df.withColumns(Map(
    "duration_sec"     -> when(col("duration") >= 1000000L, (col("duration") / 1000000L).cast("long")),
    "cpu_time_sec"     -> when(col("cpu_time") >= 1000000L, (col("cpu_time") / 1000000L).cast("long")),
    "logical_reads_mb" -> when(col("logical_reads") >= 128L, (col("logical_reads") / 128L).cast("long")),
    "physical_reads_mb"-> when(col("physical_reads") >= 128L, (col("physical_reads") / 128L).cast("long")),
    "writes_mb"        -> when(col("writes") >= 128L, (col("writes") / 128L).cast("long"))
  ))

  // ---- E8/J2: as-of entity-name backfill (pkg/xe/xe.go:407-431) ------------
  /** Scale-safe as-of join: the tiny dim is turned into validity intervals
    * [valid_from, valid_to) via a window **on the dim side only**, then
    * broadcast-joined — no window or extra shuffle ever touches the fact
    * table, so the plan survives a 100× scale-up unchanged. */
  def withEntityName(df: DataFrame, spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("entity_id").orderBy("valid_from")
    // coalesce(1): SinglePartition satisfies the window's clustered
    // distribution, so the tiny dim avoids even its own hash exchange —
    // the whole pipeline plan is then exchange-free end to end
    val dim = Lookups.entityNames(spark).coalesce(1)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .select(col("entity_id"), col("name").as("entity_name"),
        col("valid_from"), col("valid_to"))
    df.join(broadcast(dim),
      df("db_id") === dim("entity_id") && df("ts") >= dim("valid_from") &&
        (dim("valid_to").isNull || df("ts") < dim("valid_to")),
      "left")
      .drop("entity_id", "valid_from", "valid_to")
  }

  // ---- E9/E10: broadcast semi-join flags (pkg/xe/xe.go:206-211, :254-262) --
  def withErrorFlags(df: DataFrame, spark: SparkSession): DataFrame = {
    val login = Lookups.loginErrors(spark).withColumnRenamed("error_number", "len_")
      .withColumn("login_failed_flag", lit(true))
    val logged = Lookups.loggedErrors(spark).withColumnRenamed("error_number", "lgn_")
      .withColumn("logged_flag", lit(true))
    df.join(broadcast(login), df("error_number") === login("len_"), "left")
      .join(broadcast(logged), df("error_number") === logged("lgn_"), "left")
      .withColumn("login_failed", coalesce(col("login_failed_flag"), lit(false)))
      .withColumn("xe_is_event_logged", coalesce(col("logged_flag"), lit(false)))
      .drop("len_", "lgn_", "login_failed_flag", "logged_flag")
  }

  // ---- 18456 state description (pkg/xe/xe.go:288-337) ----------------------
  def stateDescription: Column = {
    val base = Lookups.state18456.foldLeft(lit(null).cast("string")) {
      case (acc, (st, desc)) => when(col("state_num") === st, desc).otherwise(acc)
    }
    when(col("error_number") === 18456, base)
  }

  // ---- E5-like tool enrichment: broadcast join on tool --------------------
  def withToolInfo(df: DataFrame, spark: SparkSession): DataFrame =
    df.join(broadcast(Lookups.toolInfo(spark)), Seq("tool"), "left")

  def withRoleSeverity(df: DataFrame, spark: SparkSession): DataFrame =
    df.join(broadcast(Lookups.roleSeverity(spark)), Seq("role"), "left")

  /** Full enrichment pass over a parsed frame. */
  def enrich(parsed: DataFrame, spark: SparkSession): DataFrame = {
    val base = parsed
      .withColumn("xe_severity_value", severityValue)
      .withColumn("xe_severity_keyword", severityKeyword(col("xe_severity_value")))
      .withColumn("xe_category", category)
      .withColumn("xe_description", description)
      .withColumn("xe_acct_app", acctApp)
      .withColumn("xe_acct_app_client", acctAppClient)
      .withColumn("xe_state_description", stateDescription)
    withEntityName(withErrorFlags(withUnits(base), spark), spark)
  }
}
