package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FusedParse

/** Property tests (SURVEY §5: the reference's table tests generalize to
  * properties). The fused-parse fuzz runs WITHOUT Spark: the regex battery
  * semantics are restated with java.util.regex and compared against the
  * hand-rolled scanners on generated adversarial text. */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  // ---- java.util.regex restatement of the battery (the spec) --------------
  private def reFirst(t: String, p: String, g: Int): String = {
    val m = java.util.regex.Pattern.compile(p).matcher(t)
    if (m.find()) m.group(g) else ""
  }
  private def reNum(t: String, key: String): java.lang.Long = {
    val v = reFirst(t, key + "=(\\d+)", 1)
    if (v.isEmpty) null else java.lang.Long.valueOf(v)
  }
  private def reStr(t: String, key: String): String = {
    val v = reFirst(t, key + "=([^ ]+)", 1)
    if (v.isEmpty) null else v
  }
  private def reTriple(t: String, g: Int): java.lang.Long = {
    val v = reFirst(t, "Error: (\\d+), Severity: (\\d+), State: (\\d+)", g)
    if (v.isEmpty) null else java.lang.Long.valueOf(v)
  }
  private def reClient(t: String): String = {
    val v = reFirst(t, "\\[CLIENT: ([^\\]\\[]*)\\]", 1)
    if (v.isEmpty) null else v
  }
  private def reUser(t: String): String = {
    val v = reFirst(t, "user '([^']*)'", 1)
    if (v.isEmpty) null else v
  }

  private val fragment: Gen[String] = Gen.oneOf(
    Gen.oneOf("duration", "signal_duration", "cpu_time", "app", "host",
      "principal", "wait_type", "batch_text", "state", "sync_state",
      "previous_state", "current_state", "data", "database_name",
      "file_size", "plan_handle", "ag", "xstate", "tate").flatMap(k =>
      Gen.oneOf(
        Gen.const(s"$k="),
        Gen.chooseNum(0L, 99999L).map(n => s"$k=$n"),
        Gen.alphaNumStr.map(v => s"$k=$v"))),
    Gen.const("Error: "), Gen.const("Error: 1, Severity: "),
    Gen.chooseNum(0L, 999L).map(n => s"Error: $n, Severity: ${n % 26}, State: ${n % 9}."),
    Gen.const("[CLIENT: "), Gen.const("]"), Gen.const("["),
    Gen.const("[CLIENT: <local machine>]"), Gen.const("[CLIENT: ::1]"),
    Gen.const("user '"), Gen.const("user 'sa'"), Gen.const("'"),
    Gen.alphaNumStr, Gen.const(" "), Gen.const("  "))

  private val textGen: Gen[String] = for {
    prefix <- Gen.oneOf("event=login ", "event=x9_y ", "event=", "", "junk ")
    parts <- Gen.listOfN(8, fragment)
  } yield prefix + parts.mkString(" ")

  test("fused scanners == java regex battery on generated text") {
    check("fused-parity", Prop.forAll(textGen) { t =>
      val p = FusedParse.parseAll(t)
      val expPrincipal = { val kv = reStr(t, "principal"); if (kv != null) kv else reUser(t) }
      p.duration == reNum(t, "duration") &&
        p.signalDuration == reNum(t, "signal_duration") &&
        p.cpuTime == reNum(t, "cpu_time") &&
        p.app == reStr(t, "app") &&
        p.host == reStr(t, "host") &&
        p.waitType == reStr(t, "wait_type") &&
        p.errorNumber == reTriple(t, 1) &&
        p.severity == reTriple(t, 2) &&
        p.state == reTriple(t, 3) &&
        p.client == reClient(t) &&
        p.principal == expPrincipal &&
        p.name == reFirst(t, "^event=([a-z_0-9]+)", 1)
    }, 1000)
  }

  test("collapseWs == regex \\s+ replacement") {
    val wsGen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf(' ', '\t', '\n', '\r', '\f', '\u000B'))).map(_.mkString)
    check("collapse", Prop.forAll(wsGen) { t =>
      FusedParse.collapseWs(t) == t.replaceAll("\\s+", " ")
    })
  }

  test("batchText == regex batch_text=(.*)$ incl. newline edge cases") {
    val gen = for {
      pre <- Gen.alphaNumStr
      mid <- Gen.oneOf("batch_text=", "batch_text=abc", "x=1")
      tail <- Gen.oneOf("", "\n", "\r", "\r\n", "\nmore", " tail batch_text=second")
    } yield s"$pre $mid$tail"
    check("batch", Prop.forAll(gen) { t =>
      val v = reFirst(t, "batch_text=(.*)$", 1)
      val exp = if (v.isEmpty) null else v
      FusedParse.batchText(t) == exp
    })
  }
}
