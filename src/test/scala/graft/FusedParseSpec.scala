package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks
import graft.functions.{FusedParse, Grok}
import graft.sources.Transcripts

/** The parity contract of the fused parse Expression: every field equals
  * the regexp_extract battery, over the full synthetic corpus AND
  * adversarial strings targeting the scanner edge cases. */
class FusedParseSpec extends SparkSpec with TableDrivenPropertyChecks {
  import TestSpark.spark.implicits._

  private val fieldNames = FusedParse.fields.map(_.name)

  private def compareOn(turns: org.apache.spark.sql.DataFrame): Unit = {
    val fused = Grok.parse(turns)
      .select(col("text") +: fieldNames.map(col): _*)
    val battery = Grok.parseErrorlog(Grok.parseRegex(turns))
      .select(col("text") +: fieldNames.map(col): _*)
    val diff1 = fused.except(battery)
    val diff2 = battery.except(fused)
    val d1 = diff1.collect()
    val d2 = diff2.collect()
    assert(d1.isEmpty && d2.isEmpty,
      s"fused-only: ${d1.take(2).mkString("; ")}\nbattery-only: ${d2.take(2).mkString("; ")}")
  }

  test("fused parse equals regex battery over the full sf0.001 corpus") {
    compareOn(Transcripts.load(spark, tiny))
  }

  test("fused parse equals regex battery on adversarial strings") {
    val cases = Seq(
      "",                                             // empty
      "event=",                                       // name absent
      "event=x",                                      // no space after name
      "no prefix at all",
      "event=wait_info signal_duration=5",            // duration only inside signal_duration
      "event=x duration= signal_duration=7",          // first duration= has no digits
      "event=x app= app=real",                        // first app= empty, second real
      "event=x [CLIENT: ]",                           // empty client capture
      "event=x [CLIENT: [nested] ok]",                // '[' inside capture → skip
      "event=x [CLIENT: 10.0.0.1] tail [CLIENT: ::1]",// two clients → leftmost
      "event=x user ''",                              // empty principal
      "event=x user 'unterminated",                   // no closing quote
      "event=x principal=p user 'q'",                 // kv wins over quoted
      "event=x Error: 1, Severity: 2, Stat_ 3",       // broken triple
      "event=x Error: 1, Severity: 2, State: 3 Error: 9, Severity: 9, State: 9",
      "event=x Error: , Severity: 2, State: 3 then Error: 7, Severity: 8, State: 9",
      "event=x batch_text=",                          // empty batch capture
      "event=x batch_text=abc def ghi",
      "event=errorlog_written 2024-01-15  10:22:33.12\tLogon   2024-01-15 10:22:33.12 msg here",
      "event=errorlog_written one two",               // < 3 tokens
      "event=errorlog_written a b Logon",             // logon with empty msg
      "event=x cpu_time=00123 rest",                  // leading zeros
      "événement=UNICODE non-ascii prefix",
      "event=x host=hést next",                       // non-ascii in kv value
      "event=x duration=99999999999999999999",        // 20 digits → cast null
      "event=x duration=9223372036854775807",         // Long.MaxValue exact
      "event=x duration=9223372036854775808",         // MaxValue+1 → null
      "event=x Error: 99999999999999999999, Severity: 2, State: 3", // overflow inside matched triple
      "event=x xstate=5 state=7",                     // 'state=' matches INSIDE xstate= first
      "event=x tate=1 state=2",                       // shorter non-key suffix
      "event=x sync_state=A data=B",                  // state= inside sync_state=
      "event=x state= state=real",                    // first occurrence has no value
      "event=x commit_policy_target=T commit_policy=C",
      "event=x object_id=9 object_name=n object_type=T",
      "event=x batch_text=abc\u2028",              // U+2028 is a line terminator for '.'/'$'
      "event=x batch_text=abc\u2028tail",          // interior U+2028: '$' fails there, scan moves on
      "event=x batch_text=abc\u0085"               // NEL terminator
    )
    val df = cases.zipWithIndex.map { case (t, i) =>
      ("c", i, "user", t, "", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    compareOn(df)
  }
}
