package graft

import org.apache.spark.sql.functions._

/** Parity contract of the fused standard-filter kernel
  * ([[graft.functions.FusedFilter]]): the surviving row set equals the
  * declarative F1–F7 + rule-chain stack, over the transcript corpus and
  * adversarial rows covering every branch (malformed text, 18330/18456
  * triples, dbghelp lines, wait_info routing, null text/role/tool, and
  * the null-propagating error_reported-without-number edge). */
class FilterFusionSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def compare(df: org.apache.spark.sql.DataFrame): Unit = {
    val fused = operators.Filters.standardOnRaw(df)
      .select("conv_id", "turn_idx")
    val decl = operators.Filters.standardOnRawDeclarative(df)
      .select("conv_id", "turn_idx")
    assert(fused.except(decl).isEmpty && decl.except(fused).isEmpty,
      "fused standard filter must keep exactly the declarative row set")
  }

  test("fused filter equals declarative stack over the corpus") {
    compare(sources.Transcripts.load(spark, tiny))
  }

  test("fused filter equals declarative stack on adversarial rows") {
    val rows = Seq(
      ("c1", 0L, "user", "", "event=login principal=u1"),
      ("c1", 1L, "user", "", ""),                        // malformed
      ("c1", 2L, "user", "", "garbage no event"),        // malformed
      ("c1", 3L, "user", "", "event=connectivity_ring_buffer_recorded x=1"),
      ("c1", 4L, "user", "", "event=error_reported Error: 18330, Severity: 10, State: 1. x"),
      ("c1", 5L, "user", "", "event=error_reported Error: 18331, Severity: 10, State: 1. x"),
      ("c1", 6L, "user", "", "event=error_reported no triple here"), // null en
      ("c1", 7L, "user", "", "event=errorlog_written 2024-01-01 Server Stack dump being sent, using 'dbghelp.dll' version"),
      ("c1", 8L, "user", "", "event=errorlog_written 2024-01-01 Server USING 'DBGHELP.DLL' upper"),
      ("c1", 9L, "user", "sql_query", "event=wait_info wait_type=LCK_M_X"),
      ("c1", 10L, "user", "other_tool", "event=wait_info wait_type=LCK_M_X"),
      ("c1", 11L, "system", "", "event=error_reported Error: 18456, Severity: 14, State: 1. x"),
      ("c1", 12L, "user", "", "event=error_reported Error: 18456, Severity: 14, State: 1. x"),
      ("c1", 13L, "system", "", "event=errorlog_written 2024-01-01 Logon Error: 18456, Severity: 14, State: 5. x"),
      ("c1", 14L, null, null, "event=login principal=u2"),
      ("c1", 15L, "user", "", null)
    ).toDF("conv_id", "turn_idx", "role", "tool", "text")
    compare(rows)
  }
}
