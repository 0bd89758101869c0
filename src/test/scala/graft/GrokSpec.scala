package graft

import org.apache.spark.sql.functions._
import graft.functions.{Enrich, Grok}

/** Grok goldens: the reference's errorlog table tests
  * (`/root/reference/pkg/xe/xe_errorlog_test.go:20-110`) transplanted onto
  * our transcript shape, plus truncation cases from xe_left_test.go. */
class GrokSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def parseOne(text: String) = {
    val df = Seq(("c1", 0, "user", text, "", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    Grok.parse(df).collect()(0)
  }

  test("error triple + client extraction (xe.go:20,22 regexes)") {
    val r = parseOne("event=error_reported Error: 18456, Severity: 14, State: 8. " +
      "Login failed for user 'sa'. [CLIENT: 10.1.2.3] db_id=4")
    assert(r.getAs[Long]("error_number") == 18456L)
    assert(r.getAs[Long]("severity_num") == 14L)
    assert(r.getAs[Long]("state_num") == 8L)
    assert(r.getAs[String]("client_addr") == "10.1.2.3")
    assert(r.getAs[String]("principal") == "sa")
    assert(r.getAs[Long]("db_id") == 4L)
  }

  test("client variants: IPv6 and <local machine> (xe_errorlog_test.go)") {
    assert(parseOne("event=login x [CLIENT: ::1]").getAs[String]("client_addr") == "::1")
    assert(parseOne("event=login x [CLIENT: <local machine>]")
      .getAs[String]("client_addr") == "<local machine>")
  }

  test("errorlog split + Logon repeated-timestamp strip (xe.go:382-398)") {
    val r = parseOne("event=errorlog_written 2024-01-15 10:22:33.12 Logon   " +
      "2024-01-15 10:22:33.12 Error: 18456, Severity: 14, State: 5. " +
      "Login failed for user 'u9'. [CLIENT: ::1]")
    assert(r.getAs[String]("errorlog_process") == "logon")
    assert(r.getAs[String]("errorlog_message").startsWith("Error: 18456"))
  }

  test("errorlog non-Logon keeps message intact") {
    val r = parseOne("event=errorlog_written 2024-01-15 10:22:33.12 spid52   " +
      "SQL Server has encountered 3 occurrence(s) of I/O requests")
    assert(r.getAs[String]("errorlog_process") == "spid52")
    assert(r.getAs[String]("errorlog_message")
      == "SQL Server has encountered 3 occurrence(s) of I/O requests")
  }

  test("absent fields are null, not zero (absent-key semantics, SURVEY §7.4.2)") {
    val r = parseOne("event=wait_info wait_type=CXPACKET duration=5000 signal_duration=3")
    assert(r.isNullAt(r.fieldIndex("error_number")))
    assert(r.isNullAt(r.fieldIndex("cpu_time")))
    assert(r.getAs[Long]("duration") == 5000L)
  }

  test("unicode-safe left-truncate counts codepoints (xe_left_test.go)") {
    val df = Seq("héllo🙂wörld", "ab", "🙂🙂🙂🙂").toDF("s")
      .select(Grok.left(col("s"), 3).as("t"))
    val out = df.collect().map(_.getString(0))
    assert(out(0) == "hél...")
    assert(out(1) == "ab")
    assert(out(2) == "🙂🙂🙂...")
  }

  test("NFC truncation: byte gate, normalize, truncate (xe.go:907-937)") {
    val cases = Seq(
      // (input, n, expected) — adapted from xe_left_test.go:16-45
      ("😢✅👌❤", 5, "😢✅👌❤"),          // 14 bytes > 5 → NFC no-op, 4 cp <= 5
      ("😢✅👌❤", 3, "😢✅👌..."),
      ("abcdef", 6, "abcdef"),            // byte gate: 6 <= 6, untouched
      ("abcdef", 3, "abc..."),
      ("ăabcdef", 7, "ăabcdef"),          // 8 bytes > 7 → NFC no-op, 7 cp
      ("ăabcdef", 3, "ăab..."),
      ("e\u0301abc", 3, "\u00e9ab..."),        // NFC fuses, THEN truncates
      ("e\u0301abc", 4, "\u00e9abc"),          // bytes 6 > 4; NFC → 4 cp, no trim
      ("e\u0301ab", 5, "e\u0301ab"),      // bytes 5 <= 5: gate SKIPS NFC
      (null, 3, null))
    cases.foreach { case (in, n, want) =>
      assert(functions.Nfc.nfcLeft(in, n) == want, s"nfcLeft($in, $n)")
    }
    // the Expression path agrees with the plain-String path
    val df = Seq("e\u0301abc", "abcdef", "x" * 400).toDF("s")
      .select(functions.Nfc.left(col("s"), 3).as("t"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("\u00e9ab...", "abc...", "xxx..."))
    // and with the declarative built-ins + normalize-UDF reference
    val decl = Seq("e\u0301abc", "abcdef", "ab").toDF("s")
      .select(Grok.nfcLeft(col("s"), 3).as("t"))
    assert(decl.collect().map(_.getString(0)).toSeq ==
      Seq("\u00e9ab...", "abc...", "ab"))
  }

  test("unit gating thresholds (xe_units_test.go:11-66)") {
    val df = Seq(
      ("event=sql_batch_completed cpu_time=999999 duration=1000000 logical_reads=127 physical_reads=128 writes=256 row_count=1 db_id=1 batch_text=x")
    ).toDF("text")
      .withColumn("conv_id", lit("c")).withColumn("turn_idx", lit(0))
      .withColumn("role", lit("user")).withColumn("tool", lit(""))
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val r = Enrich.withUnits(Grok.parse(df)).collect()(0)
    assert(r.isNullAt(r.fieldIndex("cpu_time_sec")))          // below 1e6 gate
    assert(r.getAs[Long]("duration_sec") == 1L)               // exactly at gate
    assert(r.isNullAt(r.fieldIndex("logical_reads_mb")))      // 127 < 128 pages
    assert(r.getAs[Long]("physical_reads_mb") == 1L)
    assert(r.getAs[Long]("writes_mb") == 2L)
  }
}
