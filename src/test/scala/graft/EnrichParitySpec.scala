package graft

import org.apache.spark.sql.functions._
import graft.functions.{Enrich, Grok}
import graft.sources.Transcripts

/** Parity contract of the fused enrichment Expression: every derived field
  * equals the declarative Column battery, over the full synthetic corpus
  * AND adversarial rows hitting null-propagation / truncation / humanizer
  * boundary arms. */
class EnrichParitySpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private val derivedCols =
    functions.FusedEnrich.outputSchema.fields.map(_.name).toSeq

  private def compareOn(turns: org.apache.spark.sql.DataFrame): Unit = {
    val parsed = Grok.parse(turns)
    val fused = Enrich.withDerived(parsed)
      .select(col("text") +: derivedCols.map(col): _*)
    val decl = Enrich.withDerivedDeclarative(parsed)
      .select(col("text") +: derivedCols.map(col): _*)
    val d1 = fused.except(decl).collect()
    val d2 = decl.except(fused).collect()
    assert(d1.isEmpty && d2.isEmpty,
      s"fused-only: ${d1.take(2).mkString("; ")}\ndecl-only: ${d2.take(2).mkString("; ")}")
  }

  test("fused enrichment equals declarative columns over the sf0.001 corpus") {
    compareOn(Transcripts.load(spark, tiny))
  }

  test("fused enrichment equals declarative columns on adversarial rows") {
    val longBody = "é" * 350 // multi-byte, >300 codepoints
    val cases = Seq(
      "event=login host=h1",                            // null principal → null desc
      "event=login principal=p",                        // minimal login
      "event=login principal=p app=a",                  // no host
      "event=error_reported no triple here",            // null en/sev/st → null desc, sev 3 (missing→err)
      "event=error_reported Error: 5, Severity: 2, State: 3. " + longBody,
      "event=error_reported Error: 18456, Severity: 14, State: 8. x",  // known 18456 state
      "event=error_reported Error: 18456, Severity: 14, State: 59. x", // unknown state → null
      "event=error_reported Error: 18456, Severity: 14, State: 103. x",// Azure AD group arm
      "event=wait_info wait_type=X",                    // no duration → null desc
      "event=wait_info duration=99999999999999999999 wait_type=X", // overflow → null
      "event=wait_info duration=4000000000 wait_type=LCK",  // h+m arm
      "event=wait_info duration=75000000 wait_type=W",      // m+s arm
      "event=wait_info duration=2000000 wait_type=W",       // s arm
      "event=wait_info duration=2000 wait_type=W",          // ms arm
      "event=wait_info duration=7 wait_type=W",             // us arm
      "event=sql_batch_completed cpu_time=5000 batch_text=SELECT 1",
      "event=sql_batch_completed batch_text=x",         // empty usage → no prefix
      "event=sql_batch_completed logical_reads=0 writes=300 batch_text=x", // >0 gates
      "event=rpc_completed cpu_time=9 statement=EXEC p",
      "event=blocked_process_report database_name=db lock_mode=X", // missing fields → null
      "event=blocked_process_report duration=5000 database_name=db resource_owner_type=LOCK lock_mode=S object_id=7",
      "event=database_file_size_change size_change_kb=2048",   // MB arm, missing db/file
      "event=database_file_size_change size_change_kb=100 duration=3000",
      "event=database_file_size_change",                // all parts absent → ""
      "event=sp_server_diagnostics_component_result component=c state=ERROR data=d",
      "event=sp_server_diagnostics_component_result component=c state=CLEAN data=d",
      "event=sp_server_diagnostics_component_result component=c",  // missing state/data
      "event=xml_deadlock_report",
      "event=lock_deadlock_chain",                      // null resource_description
      "event=object_altered database_name=d object_name=o object_type=T",
      "event=object_created database_name=d object_name=o",   // missing type → null
      "event=alwayson_ddl_executed ddl_phase=commit statement=ALTER X",
      "event=availability_replica_state_change ag=g previous_state=A current_state=B",
      "event=availability_replica_state ag=g current_state=B",
      "event=availability_replica_manager_state_change current_state=ONLINE",
      "event=hadr_db_partner_set_sync_state database_name=d commit_policy=S commit_policy_target=A sync_state=OK",
      "event=hadr_db_partner_set_sync_state database_name=d",  // partial → null
      "event=attention cpu_time=5000 duration=7 sql_text=SELECT 1",
      "event=attention sql_text=" + longBody,          // truncation via sqlDesc
      "event=attention cpu_time=5",                    // null sql_text → null desc
      "event=hadr_trace_message hadr_message=lease renewal 3 for ag",
      "event=hadr_trace_message",                      // null passthrough
      "event=database_mirroring_state_change database_name=d state_change_desc=Suspended",
      "event=database_mirroring_state_change database_name=d", // null → null desc
      "event=sql_exit_invoked shutdown_option=WITH_NOWAIT",
      "event=sql_exit_invoked",
      "event=errorlog_written a b Server " + longBody,
      "event=unknown_event " + longBody,                // default arm truncation
      // NFC arms: combining acute fuses under normalization; the first
      // exceeds 300 codepoints even after fusion (truncate), the second
      // only before it (normalize without suffix)
      "event=unknown_event " + ("e\u0301" * 301),
      "event=unknown_event " + ("e\u0301" * 200),
      "no event prefix at all"
    )
    val df = cases.zipWithIndex.map { case (t, i) =>
      ("c", i, "user", t, "", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    compareOn(df)
  }

  test("fused enrichment equals declarative columns on a seeded random corpus") {
    val rnd = new scala.util.Random(20260816L)
    val names = Seq("login", "error_reported", "sql_batch_completed",
      "rpc_completed", "sp_statement_completed", "sql_statement_completed",
      "wait_info", "wait_info_external", "errorlog_written",
      "object_altered", "object_created", "object_deleted",
      "lock_deadlock_chain", "xml_deadlock_report",
      "hadr_db_partner_set_sync_state", "blocked_process_report",
      "alwayson_ddl_executed", "availability_replica_manager_state_change",
      "availability_replica_state_change", "availability_replica_state",
      "sp_server_diagnostics_component_result", "database_file_size_change",
      "attention", "hadr_trace_message", "database_mirroring_state_change",
      "sql_exit_invoked", "made_up_event", "")
    val frags = Seq(
      () => s"principal=u${rnd.nextInt(50)}",
      () => s"app=a${rnd.nextInt(5)}",
      () => s"host=h${rnd.nextInt(5)}",
      () => s"Error: ${rnd.nextInt(30000)}, Severity: ${rnd.nextInt(30)}, State: ${rnd.nextInt(140)}.",
      () => s"cpu_time=${rnd.nextLong(math.abs(rnd.nextLong()) % 10000000L + 1)}",
      () => s"duration=${math.abs(rnd.nextLong()) % 5000000000L}",
      () => s"logical_reads=${rnd.nextInt(500)}",
      () => s"physical_reads=${rnd.nextInt(200)}",
      () => s"writes=${rnd.nextInt(300)}",
      () => s"wait_type=W${rnd.nextInt(9)}",
      () => s"database_name=db_${rnd.nextInt(9)}",
      () => s"object_name=o${rnd.nextInt(9)}",
      () => s"object_type=T${rnd.nextInt(4)}",
      () => s"file_name=f${rnd.nextInt(4)}",
      () => s"size_change_kb=${Seq(0, 8, 100, 1024, 2048, 3000)(rnd.nextInt(6))}",
      () => s"resource_description=r${rnd.nextInt(9)}",
      () => s"lock_mode=${Seq("S", "X", "IX")(rnd.nextInt(3))}",
      () => s"resource_owner_type=LOCK",
      () => s"object_id=${rnd.nextInt(99999)}",
      () => s"ag=g${rnd.nextInt(4)}",
      () => s"previous_state=P${rnd.nextInt(3)}",
      () => s"current_state=C${rnd.nextInt(3)}",
      () => s"commit_policy=CP${rnd.nextInt(2)}",
      () => s"commit_policy_target=CT${rnd.nextInt(2)}",
      () => s"sync_state=S${rnd.nextInt(3)}",
      () => s"ddl_phase=${Seq("begin", "commit")(rnd.nextInt(2))}",
      () => s"component=c${rnd.nextInt(3)}",
      () => s"state=${Seq("ERROR", "WARNING", "CLEAN", "x")(rnd.nextInt(4))}",
      () => s"data=d${rnd.nextInt(9)}",
      () => s"state_change_desc=${Seq("Synchronized", "Disconnected", "Suspended")(rnd.nextInt(3))}",
      () => s"shutdown_option=${Seq("WITH_NOWAIT", "NORMAL")(rnd.nextInt(2))}",
      () => s"junk${rnd.nextInt(100)} noise",
      () => "x" * (rnd.nextInt(400) + 1))
    val tails = Seq(
      () => s" batch_text=SELECT ${rnd.nextInt(100)}",
      () => s" statement=EXEC p${rnd.nextInt(100)} @x = 1",
      () => s" sql_text=SELECT c${rnd.nextInt(9)} FROM t WHERE k = ${rnd.nextInt(100)}",
      () => s" hadr_message=lease renewal ${rnd.nextInt(9)} attempt",
      () => "")
    val cases = (0 until 600).map { i =>
      val name = names(rnd.nextInt(names.length))
      val nFrags = rnd.nextInt(6)
      val body = (0 until nFrags).map(_ => frags(rnd.nextInt(frags.length))())
        .mkString(" ")
      val tail = tails(rnd.nextInt(tails.length))()
      (s"c", i, "user", s"event=$name $body$tail", "",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }
    compareOn(cases.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts"))
  }
}
