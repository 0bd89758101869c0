package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The transcript input table of the graft: multi-turn agent transcripts with
  * columns `(conv_id, turn_idx, role, text, tool, ts)` (BASELINE.json
  * input_hint), synthesized **deterministically** from the driver-provided
  * `events` parquet with a single SQL string that is valid in BOTH Spark SQL
  * and DuckDB. The oracle side prepends the same string as a CTE, so Spark
  * and DuckDB operate on byte-identical input by construction (verified:
  * identical md5 over the full sorted result in both engines).
  *
  * The embedded `text` bodies mirror the reference's parse fixtures
  * (xelogstash `pkg/xe/xe_test.go:36-806`, `xe_errorlog_test.go:20-88`):
  * `Error: N, Severity: N, State: N` triples (`pkg/xe/xe.go:20`),
  * `[CLIENT: addr]` with IPv4 / `<local machine>` / `::1` variants
  * (`pkg/xe/xe.go:22`), errorlog-shaped lines with the `Logon`
  * repeated-timestamp case (`pkg/xe/xe.go:382-398`), resource-usage
  * key=value fields for unit gating (`pkg/xe/xe_units.go:5-36`), and the
  * `dbghelp.dll` suppression marker (`pkg/app/process_session.go:227-233`).
  *
  * Skew: every 5th user collapses into one hot conversation (`conv_hot`,
  * ~20% of all rows) so skew handling is exercised (SURVEY.md §7.4.5).
  */
object Transcripts {

  /** Dialect-common synthesis SQL. `eventsRel` is the relation to read:
    * "events" on the DuckDB/oracle side; "parquet.`<dir>/events.parquet`"
    * on the Spark side. Columns: conv_id, turn_idx, role, text, tool, ts
    * plus lineage provenance src_file / src_offset (analog of
    * xe_file_name/xe_file_offset, `pkg/app/process_session.go:235-238`).
    */
  def synthSql(eventsRel: String): String = s"""
SELECT
  conv_id,
  CAST(row_number() OVER (PARTITION BY conv_id ORDER BY event_id) - 1 AS INT) AS turn_idx,
  CASE CAST(event_id % 4 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' WHEN 2 THEN 'tool' ELSE 'system' END AS role,
  CASE event_type
    WHEN 'error' THEN
      CASE CAST(k % 7 AS INT)
        WHEN 4 THEN 'event=sql_exit_invoked shutdown_option=' || CASE WHEN k2 % 2 = 0 THEN 'WITH_NOWAIT' ELSE 'NORMAL' END
        WHEN 5 THEN 'event=xml_deadlock_report db_id=' || (1 + k % 8) || ' xml=<deadlock><victim-list>process ' || (k % 30) || '</victim-list><resource>KEY ' || (1 + k % 8) || ':' || (100 + k % 900) || '</resource></deadlock>'
        WHEN 6 THEN 'event=lock_deadlock_chain resource_description=keylock_' || (k % 40) || ' session_id=' || (50 + k % 40) || ' db_id=' || (1 + k % 8)
        ELSE 'event=error_reported Error: ' || (18000 + k % 500) || ', Severity: ' || (10 + k % 16) || ', State: ' || (1 + k % 60)
          || '. Login failed for user ''u' || user_id || '''. Reason: Password did not match that for the login provided. [CLIENT: ' || client || '] db_id=' || (1 + k % 8)
      END
    WHEN 'signup' THEN
      'event=login principal=u' || user_id || ' app=app_' || (k % 10) || ' host=host' || lpad(CAST(event_id % 20 AS STRING), 2, '0') || ' Login succeeded. [CLIENT: ' || client || ']'
    WHEN 'purchase' THEN
      CASE CAST(k % 9 AS INT)
        WHEN 6 THEN CASE CAST(k2 % 4 AS INT)
          WHEN 3 THEN 'event=attention cpu_time=' || (k * 31013) || ' duration=' || (k * 104729 + event_id % 1000) || ' db_id=' || (1 + k % 8)
            || ' sql_text=SELECT o_totalprice FROM orders WHERE o_orderkey = ' || event_id
          ELSE 'event=' || CASE CAST(k2 % 3 AS INT) WHEN 0 THEN 'rpc_completed' WHEN 1 THEN 'sp_statement_completed' ELSE 'sql_statement_completed' END
            || ' cpu_time=' || (k * 31013) || ' logical_reads=' || (k * 31) || ' physical_reads=' || (k % 140) || ' writes=' || (k % 260) || ' duration=' || (k * 104729 + event_id % 1000) || ' db_id=' || (1 + k % 8)
            || ' statement=EXEC sp_task_' || (k % 50) || ' @id = ' || event_id
        END
        WHEN 7 THEN 'event=object_' || CASE CAST(k2 % 3 AS INT) WHEN 0 THEN 'altered' WHEN 1 THEN 'created' ELSE 'deleted' END
          || ' database_name=db_' || (1 + k % 8) || ' object_name=obj_' || (k % 100)
          || ' object_type=' || CASE CAST(k2 % 5 AS INT) WHEN 0 THEN 'PROC' WHEN 1 THEN 'TABLE' WHEN 2 THEN 'VIEW' WHEN 3 THEN 'INDEX' ELSE 'TRIGGER' END || ' db_id=' || (1 + k % 8)
        WHEN 8 THEN 'event=database_file_size_change database_name=db_' || (1 + k % 8)
          || ' file_name=db_' || (1 + k % 8) || CASE WHEN k2 % 2 = 0 THEN '_Data' ELSE '_Log' END
          || ' size_change_kb=' || CASE WHEN k2 % 3 = 0 THEN CAST((1 + k % 64) * 1024 AS STRING) ELSE CAST(8 + k % 1000 AS STRING) END
          || ' duration=' || ((8 + k % 30000) * 1000)
        ELSE 'event=sql_batch_completed cpu_time=' || (k * 31013) || ' duration=' || (k * 104729 + event_id % 1000) || ' logical_reads=' || (k * 31) || ' physical_reads=' || (k % 140) || ' writes=' || (k % 260) || ' row_count=' || (k % 1000) || ' db_id=' || (1 + k % 8)
          || ' is_system=' || CASE WHEN k % 2 = 0 THEN 'true' ELSE 'false' END
          || ' cpu_pct=' || (k % 100) || '.25'
          || ' plan_handle=' || CASE WHEN k % 5 = 0 THEN '0000000000000000' ELSE lpad(CAST(k * 7919 % 100000000 AS STRING), 16, '0') END
          || ' file_size=' || CASE WHEN k % 4 = 0 THEN '1844674407370955' || lpad(CAST(k % 10000 AS STRING), 4, '0') ELSE CAST((k + 1) * 8192 AS STRING) END
          || ' batch_text=SELECT c_name FROM customer WHERE c_custkey = ' || event_id
      END
    WHEN 'click' THEN
      CASE CAST(k % 8 AS INT)
        WHEN 5 THEN 'event=blocked_process_report database_name=db_' || (1 + k % 8) || ' duration=' || (k * 50021)
          || ' resource_owner_type=LOCK lock_mode=' || CASE CAST(k2 % 3 AS INT) WHEN 0 THEN 'S' WHEN 1 THEN 'X' ELSE 'IX' END
          || ' object_id=' || (100000 + k % 9000)
          || ' xml=<blocked-process><process>spid ' || (50 + k % 40) || '</process></blocked-process>'
        WHEN 6 THEN
          CASE CAST(k2 % 7 AS INT)
            WHEN 5 THEN 'event=hadr_trace_message ag=ag_' || (k % 4)
              || ' hadr_message=Lease renewal attempt ' || (k % 9) || ' for AG ag_' || (k % 4)
            WHEN 6 THEN 'event=database_mirroring_state_change database_name=db_' || (1 + k % 8)
              || ' state_change_desc=' || CASE CAST(k % 3 AS INT) WHEN 0 THEN 'Synchronized' WHEN 1 THEN 'Disconnected' ELSE 'Suspended' END
            WHEN 0 THEN 'event=hadr_db_partner_set_sync_state database_name=db_' || (1 + k % 8)
              || ' commit_policy=' || CASE WHEN k2 % 2 = 0 THEN 'SYNC' ELSE 'ASYNC' END
              || ' commit_policy_target=' || CASE WHEN k % 3 = 0 THEN 'SYNC' ELSE 'ASYNC' END
              || ' sync_state=' || CASE CAST(k % 3 AS INT) WHEN 0 THEN 'SYNCHRONIZED' WHEN 1 THEN 'SYNCHRONIZING' ELSE 'NOT_SYNCHRONIZING' END
            WHEN 1 THEN 'event=availability_replica_state_change ag=ag_' || (k % 4)
              || ' previous_state=' || CASE WHEN k2 % 2 = 0 THEN 'SECONDARY_NORMAL' ELSE 'RESOLVING_NORMAL' END
              || ' current_state=' || CASE WHEN k % 3 = 0 THEN 'PRIMARY_NORMAL' ELSE 'SECONDARY_NORMAL' END
            WHEN 2 THEN 'event=availability_replica_state ag=ag_' || (k % 4)
              || ' current_state=' || CASE WHEN k2 % 2 = 0 THEN 'PRIMARY_NORMAL' ELSE 'SECONDARY_NORMAL' END
            WHEN 3 THEN 'event=availability_replica_manager_state_change current_state=' || CASE CAST(k % 3 AS INT) WHEN 0 THEN 'ONLINE' WHEN 1 THEN 'OFFLINE' ELSE 'RECOVERY' END
            ELSE 'event=alwayson_ddl_executed ddl_phase=' || CASE WHEN k2 % 2 = 0 THEN 'commit' ELSE 'begin' END
              || ' statement=ALTER AVAILABILITY GROUP ag_' || (k % 4) || ' MODIFY REPLICA'
          END
        WHEN 7 THEN 'event=sp_server_diagnostics_component_result component=' || CASE CAST(k2 % 3 AS INT) WHEN 0 THEN 'query_processing' WHEN 1 THEN 'io_subsystem' ELSE 'resource' END
          || ' state=' || CASE CAST(k2 % 5 AS INT) WHEN 0 THEN 'ERROR' WHEN 1 THEN 'WARNING' ELSE 'CLEAN' END
          || ' data=check_' || (k % 20)
        ELSE 'event=' || CASE WHEN k2 % 7 = 3 THEN 'wait_info_external' ELSE 'wait_info' END
          || ' wait_type=' || CASE CAST(k % 4 AS INT) WHEN 0 THEN 'PAGEIOLATCH_SH' WHEN 1 THEN 'LCK_M_X' WHEN 2 THEN 'CXPACKET' ELSE 'SOS_SCHEDULER_YIELD' END || ' duration=' || (k * 50021) || ' signal_duration=' || (k % 997) || ' session_id=' || (50 + event_id % 40)
          || ' act.session_id=' || (70 + k % 25) || ' act.client_app_name=app_' || (k % 10)
      END
    ELSE
      'event=errorlog_written 2024-01-15 10:2' || (k % 10) || ':33.1' || (event_id % 10) || ' ' ||
      CASE CAST(event_id % 3 AS INT)
        WHEN 0 THEN 'Logon   2024-01-15 10:2' || (k % 10) || ':33.1' || (event_id % 10) || ' Error: 18456, Severity: 14, State: ' || (1 + k % 12) || '. Login failed for user ''u' || user_id || '''. [CLIENT: ' || client || ']'
        WHEN 1 THEN 'spid5' || (event_id % 10) || '   SQL Server has encountered ' || k || ' occurrence(s) of I/O requests taking longer than 15 seconds to complete'
        ELSE 'Server   ' || CASE WHEN event_id % 17 = 0 THEN 'Stack dump being sent, using ''dbghelp.dll'' version ''4.0.5''' ELSE 'CPU time stamp frequency has changed from ' || (190000 + k) || ' to ' || (190007 + k) || ' MHz' END
      END
  END AS text,
  CASE CAST(event_id % 7 AS INT) WHEN 0 THEN 'sql_query' WHEN 1 THEN 'file_search' WHEN 2 THEN 'web_fetch' WHEN 3 THEN 'code_run' WHEN 4 THEN 'calculator' ELSE '' END AS tool,
  ts,
  'events_' || lpad(CAST(CAST(floor(event_id / 1000) AS BIGINT) AS STRING), 4, '0') AS src_file,
  CAST(event_id % 1000 AS BIGINT) AS src_offset
FROM (
  SELECT event_id, ts, user_id, event_type, k,
    CAST(floor(k / 10) AS BIGINT) AS k2,
    CASE WHEN user_id % 5 = 0 THEN 'conv_hot'
         ELSE 'conv_' || lpad(CAST(user_id AS STRING), 6, '0') END AS conv_id,
    CASE CAST(event_id % 3 AS INT)
      WHEN 0 THEN '10.0.' || (k % 256) || '.' || (event_id % 256)
      WHEN 1 THEN '<local machine>' ELSE '::1' END AS client
  FROM (
    SELECT event_id, ts, user_id, event_type,
           CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) AS k
    FROM $eventsRel
  ) b0
) b1
"""

  /** The DuckDB-side CTE prelude every oracle query starts with. */
  def oracleCte: String =
    s"WITH transcripts AS (${synthSql("events")})"

  private val MatKey = "graft.transcripts.materializedDir"
  private val MatView = "graft_transcripts_mat"

  /** Harness-side (Verify): synthesize ONCE, persist, and register, so
    * every subsequent [[load]] in the session reads the columnar cache.
    * Without this, each of the ~130 queries re-inlines the synthesis
    * expressions (the `text` CASE above is thousands of codegen lines)
    * into its own whole-stage span; where that span also holds a
    * HashAggregate, the generated method passes the JVM's 64 KB limit and
    * Spark silently falls back to interpreted execution. Production reads
    * a real Iceberg/parquet table, so the cache boundary here reproduces
    * the production plan shape, not a shortcut. */
  def materialize(spark: SparkSession, sfDir: String): Unit = {
    graft.Graft.prep(spark)
    val df = spark.sql(synthSql(s"parquet.`$sfDir/events.parquet`"))
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.createOrReplaceTempView(MatView)
    df.count()
    spark.conf.set(MatKey, sfDir)
  }

  /** Spark-side load: synthesize the transcript table for a test-data dir.
    * The `parquet.`...`` relation keeps filter/column pruning at the scan.
    * If [[materialize]] ran for this dir, the cached relation is returned
    * instead (same rows by construction — the synthesis is deterministic). */
  def load(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Graft.prep(spark)
    if (spark.conf.getOption(MatKey).contains(sfDir)) spark.table(MatView)
    else spark.sql(synthSql(s"parquet.`$sfDir/events.parquet`"))
  }

  /** Canonical 6-column transcript shape (input_hint contract). */
  def loadCanonical(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir).select("conv_id", "turn_idx", "role", "text", "tool", "ts")
}
