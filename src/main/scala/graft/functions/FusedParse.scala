package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass parse: a custom Catalyst `Expression` that computes
  * every field of the Grok battery in ~3 scans of the text instead of ~25
  * independent regex passes (SURVEY.md §4 "the one candidate for a custom
  * Expression — measure first"; measured: the battery dominates pipeline
  * cost at high core counts).
  *
  * SEMANTICS CONTRACT: bit-for-bit identical to the regexp_extract battery
  * in [[Grok]] — the scanners reproduce leftmost-substring-match regex
  * behavior exactly (e.g. `duration=` may match inside `signal_duration=`
  * if that occurrence comes first, just like the unanchored regex). The
  * FusedParseSpec asserts field equality against the battery over the full
  * corpus and adversarial strings; the per-round DuckDB oracle re-checks it
  * end-to-end.
  */
object FusedParse {

  val fields: Seq[StructField] = Seq(
    StructField("name", StringType),
    StructField("body", StringType),
    StructField("error_number", LongType),
    StructField("severity_num", LongType),
    StructField("state_num", LongType),
    StructField("client_addr", StringType),
    StructField("principal", StringType),
    StructField("app_name", StringType),
    StructField("host_name", StringType),
    StructField("cpu_time", LongType),
    StructField("duration", LongType),
    StructField("logical_reads", LongType),
    StructField("physical_reads", LongType),
    StructField("writes", LongType),
    StructField("row_count", LongType),
    StructField("db_id", LongType),
    StructField("signal_duration", LongType),
    StructField("session_id", LongType),
    StructField("wait_type", StringType),
    StructField("batch_text", StringType),
    StructField("errorlog_raw", StringType),
    StructField("errorlog_process", StringType),
    StructField("errorlog_message", StringType),
    // widened vocabulary fields (pkg/xe/xe.go:492-656 description inputs)
    StructField("database_name", StringType),
    StructField("object_name", StringType),
    StructField("object_type", StringType),
    StructField("file_name", StringType),
    StructField("size_change_kb", LongType),
    StructField("component", StringType),
    StructField("diag_state", StringType),       // key "state"
    StructField("diag_data", StringType),        // key "data"
    StructField("resource_description", StringType),
    StructField("lock_mode", StringType),
    StructField("resource_owner_type", StringType),
    StructField("object_id", LongType),
    StructField("ag_name", StringType),          // key "ag"
    StructField("previous_state", StringType),
    StructField("current_state", StringType),
    StructField("commit_policy", StringType),
    StructField("commit_policy_target", StringType),
    StructField("sync_state", StringType),
    StructField("ddl_phase", StringType),
    StructField("statement", StringType),        // statement=(.*)$ end-anchored
    // P4 inner-XML extraction (pkg/xe/xe.go:178-192, 785-813)
    StructField("deadlock_xml", StringType),
    StructField("blocked_xml", StringType),
    // typed-cast ladder raw captures (pkg/xe/xe.go:69-107); the typed cast
    // itself is applied by Enrich.withTypedFields with Spark's own Cast
    StructField("is_system_raw", StringType),
    StructField("cpu_pct_raw", StringType),
    StructField("plan_handle_raw", StringType),
    StructField("file_size_raw", StringType),
    // P2 action-channel merge: an action whose name collides with an event
    // data field lands under `<name>_action`; a non-colliding action keeps
    // its own name (pkg/xe/xe.go:155-175 merge rule, resolved at schema
    // design time because the vocabulary is static)
    StructField("session_id_action", LongType),
    StructField("client_app_name", StringType),
    // final four description-arm inputs (pkg/xe/xe.go:503 attention,
    // :617 hadr_trace_message, :629 database_mirroring_state_change,
    // :631 sql_exit_invoked)
    StructField("sql_text", StringType),         // sql_text=(.*)$ end-anchored
    StructField("hadr_message", StringType),     // hadr_message=(.*)$ end-anchored
    StructField("state_change_desc", StringType),
    StructField("shutdown_option", StringType))

  val schema: StructType = StructType(fields)

  def parsed(text: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(ParseTurnExpr(GraftBridge.expression(text)))
  }

  /** Cheap name-only extraction column (PRE-parse filter stage). */
  def nameLite(text: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(NameLiteExpr(GraftBridge.expression(text)))
  }

  /** Cheap error-number-only extraction column (PRE-parse filter stage). */
  def errorNumLite(text: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(ErrorNumLiteExpr(GraftBridge.expression(text)))
  }

  // ---- exact-parity scanners -------------------------------------------------

  private def isDigit(c: Char) = c >= '0' && c <= '9'
  private def isWs(c: Char) =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Parse digits [start, end) into a Long; null on overflow — the same
    * cast-to-null semantics as Spark's non-ANSI cast and DuckDB TRY_CAST
    * (a 20-digit capture still MATCHES the regex, then casts to null). */
  private def parseDigits(t: String, start: Int, end: Int): java.lang.Long = {
    var v = 0L
    var j = start
    while (j < end) {
      val d = t.charAt(j) - '0'
      if (v > (Long.MaxValue - d) / 10) return null
      v = v * 10 + d
      j += 1
    }
    v
  }

  /** Leftmost match of `key=` followed by >=1 digit; returns parsed run of
    * digits or null — identical to regexp_extract(t, key + "=(\d+)", 1)
    * with a non-ANSI long cast (overflow → null, no further scanning). */
  def kvNum(t: String, key: String): java.lang.Long = {
    val pat = key + "="
    var from = 0
    while (true) {
      val i = t.indexOf(pat, from)
      if (i < 0) return null
      val j = i + pat.length
      if (j < t.length && isDigit(t.charAt(j))) {
        return parseDigits(t, j, skipDigits(t, j))
      }
      from = i + 1
    }
    null
  }

  /** Leftmost match of `key=` followed by >=1 non-space char; returns the
    * maximal non-space run — identical to regexp_extract "key=([^ ]+)"
    * wrapped in empty→null. */
  def kvStr(t: String, key: String): String = {
    val pat = key + "="
    var from = 0
    while (true) {
      val i = t.indexOf(pat, from)
      if (i < 0) return null
      var j = i + pat.length
      if (j < t.length && t.charAt(j) != ' ') {
        val start = j
        while (j < t.length && t.charAt(j) != ' ') j += 1
        return t.substring(start, j)
      }
      from = i + 1
    }
    null
  }

  /** One-pass key=value scanner with EXACT unanchored-regex semantics.
    *
    * Instead of one `indexOf(key + "=")` scan per key (~36 scans/row after
    * the vocabulary widening), a single pass visits each '=' in the text
    * and walks a trie of REVERSED keys backward from it — any substring
    * occurrence of `key=` (even inside a longer token, e.g. `duration=`
    * inside `signal_duration=`, exactly like the unanchored regex) ends at
    * a '=', so the backward trie walk finds precisely the regex's match
    * set. For each key we record the FIRST occurrence whose value is
    * viable (a digit follows for numeric keys, a non-space for string
    * keys) — the same "leftmost occurrence that completes the match" rule
    * the regex battery applies. Measured ~2x on the parse stage.
    */
  private object KeyScan {
    // ids 0..NumSplit-1 are numeric keys (\d+ value), the rest string ([^ ]+)
    val numKeys: Array[String] = Array(
      "cpu_time", "duration", "logical_reads", "physical_reads", "writes",
      "row_count", "db_id", "signal_duration", "session_id",
      "size_change_kb", "object_id", "act.session_id")
    val strKeys: Array[String] = Array(
      "principal", "app", "host", "wait_type", "database_name",
      "object_name", "object_type", "file_name", "component", "state",
      "data", "resource_description", "lock_mode", "resource_owner_type",
      "ag", "previous_state", "current_state", "commit_policy",
      "commit_policy_target", "sync_state", "ddl_phase", "is_system",
      "cpu_pct", "plan_handle", "file_size", "act.client_app_name",
      "state_change_desc", "shutdown_option")
    val NumSplit: Int = numKeys.length
    val NKeys: Int = NumSplit + strKeys.length

    // named ids resolved from the arrays, so reordering/appending is safe
    private val allKeys: Array[String] = numKeys ++ strKeys
    private def kid(k: String): Int = {
      val i = allKeys.indexOf(k); require(i >= 0, s"unknown key $k"); i
    }
    val CpuTime = kid("cpu_time"); val Duration = kid("duration")
    val LogicalReads = kid("logical_reads"); val PhysicalReads = kid("physical_reads")
    val Writes = kid("writes"); val RowCount = kid("row_count")
    val DbId = kid("db_id"); val SignalDuration = kid("signal_duration")
    val SessionId = kid("session_id"); val SizeChangeKb = kid("size_change_kb")
    val ObjectId = kid("object_id"); val SessionIdAction = kid("act.session_id")
    val Principal = kid("principal"); val App = kid("app"); val Host = kid("host")
    val WaitType = kid("wait_type"); val DatabaseName = kid("database_name")
    val ObjectName = kid("object_name"); val ObjectType = kid("object_type")
    val FileName = kid("file_name"); val Component = kid("component")
    val DiagState = kid("state"); val DiagData = kid("data")
    val ResourceDescription = kid("resource_description")
    val LockMode = kid("lock_mode"); val ResourceOwnerType = kid("resource_owner_type")
    val Ag = kid("ag"); val PreviousState = kid("previous_state")
    val CurrentState = kid("current_state"); val CommitPolicy = kid("commit_policy")
    val CommitPolicyTarget = kid("commit_policy_target")
    val SyncState = kid("sync_state"); val DdlPhase = kid("ddl_phase")
    val IsSystem = kid("is_system"); val CpuPct = kid("cpu_pct")
    val PlanHandle = kid("plan_handle"); val FileSize = kid("file_size")
    val ClientAppNameAction = kid("act.client_app_name")
    val StateChangeDesc = kid("state_change_desc")
    val ShutdownOption = kid("shutdown_option")

    // reversed-key trie over chars < 128; children(node)(char) -> node|-1
    private val children = scala.collection.mutable.ArrayBuffer[Array[Int]]()
    private val terminal = scala.collection.mutable.ArrayBuffer[Int]()
    private def newNode(): Int = {
      children += Array.fill(128)(-1); terminal += -1; children.length - 1
    }
    newNode() // root = 0
    (numKeys ++ strKeys).zipWithIndex.foreach { case (k, id) =>
      var n = 0
      k.reverseIterator.foreach { c =>
        val nxt = children(n)(c)
        n = if (nxt >= 0) nxt else { val m = newNode(); children(n)(c) = m; m }
      }
      terminal(n) = id
    }
    private val childArr: Array[Array[Int]] = children.toArray
    private val termArr: Array[Int] = terminal.toArray

    /** Value-start position per key id, or -1 when the key never matches. */
    def scan(t: String): Array[Int] = {
      val out = Array.fill(NKeys)(-1)
      val len = t.length
      var i = 0
      while (i < len) {
        if (t.charAt(i) == '=') {
          var node = 0
          var d = i - 1
          var go = true
          while (go && d >= 0) {
            val c = t.charAt(d)
            if (c >= 128) go = false
            else {
              val nxt = childArr(node)(c)
              if (nxt < 0) go = false
              else {
                node = nxt
                val id = termArr(node)
                if (id >= 0 && out(id) < 0 && i + 1 < len) {
                  val v = t.charAt(i + 1)
                  val viable = if (id < NumSplit) isDigit(v) else v != ' '
                  if (viable) out(id) = i + 1
                }
                d -= 1
              }
            }
          }
        }
        i += 1
      }
      out
    }

    def num(t: String, pos: Array[Int], id: Int): java.lang.Long = {
      val p = pos(id)
      if (p < 0) null else parseDigits(t, p, skipDigits(t, p))
    }
    def str(t: String, pos: Array[Int], id: Int): String = {
      val p = pos(id)
      if (p < 0) null
      else {
        var j = p
        while (j < t.length && t.charAt(j) != ' ') j += 1
        t.substring(p, j)
      }
    }
  }

  /** Leftmost full match of "Error: (\d+), Severity: (\d+), State: (\d+)".
    * A group MATCHES when >=1 digit is present; its VALUE is the non-ANSI
    * cast of the captured digits (null on overflow) — match and cast are
    * independent, exactly like the regex battery + cast pair. */
  def errorTriple(t: String): (java.lang.Long, java.lang.Long, java.lang.Long) = {
    var from = 0
    while (true) {
      val i = t.indexOf("Error: ", from)
      if (i < 0) return (null, null, null)
      var j = i + 7
      val e1 = skipDigits(t, j)
      if (e1 > j) {
        val s1 = j; j = e1
        if (t.startsWith(", Severity: ", j)) {
          j += 12
          val e2 = skipDigits(t, j)
          if (e2 > j) {
            val s2 = j; j = e2
            if (t.startsWith(", State: ", j)) {
              val s3 = j + 9
              val e3 = skipDigits(t, s3)
              if (e3 > s3)
                return (parseDigits(t, s1, e1), parseDigits(t, s2, e2),
                  parseDigits(t, s3, e3))
            }
          }
        }
      }
      from = i + 1
    }
    (null, null, null)
  }

  private def skipDigits(t: String, start: Int): Int = {
    var j = start
    while (j < t.length && isDigit(t.charAt(j))) j += 1
    j
  }

  /** Leftmost match of "\[CLIENT: ([^\]\[]*)\]"; empty capture → null. */
  def clientAddr(t: String): String = {
    var from = 0
    while (true) {
      val i = t.indexOf("[CLIENT: ", from)
      if (i < 0) return null
      var j = i + 9
      while (j < t.length && t.charAt(j) != ']' && t.charAt(j) != '[') j += 1
      if (j < t.length && t.charAt(j) == ']') {
        val cap = t.substring(i + 9, j)
        return if (cap.isEmpty) null else cap
      }
      from = i + 1
    }
    null
  }

  /** Leftmost match of "user '([^']*)'"; empty capture → null. */
  def userQuoted(t: String): String = {
    var from = 0
    while (true) {
      val i = t.indexOf("user '", from)
      if (i < 0) return null
      val start = i + 6
      var j = start
      while (j < t.length && t.charAt(j) != '\'') j += 1
      if (j < t.length) { // closing quote found
        val cap = t.substring(start, j)
        return if (cap.isEmpty) null else cap
      }
      from = i + 1
    }
    null
  }

  /** Java-regex line terminators — the set '.' excludes and non-MULTILINE
    * '$' may precede (\n \r U+0085 U+2028 U+2029, plus the \r\n pair). */
  private def isLineTerm(c: Char) =
    c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029'

  /** "batch_text=(.*)$" with Java-regex semantics: '.' excludes line
    * terminators and non-MULTILINE '$' matches only at end of input or
    * before a FINAL terminator — an occurrence followed by an interior
    * newline fails, and the search moves to the next occurrence. */
  def batchText(t: String): String = keyToEol(t, "batch_text=")

  /** Generalized `key=(.*)$` end-anchored scan (see [[batchText]]). */
  def keyToEol(t: String, pat: String): String = {
    var from = 0
    while (true) {
      val i = t.indexOf(pat, from)
      if (i < 0) return null
      var k = i + pat.length
      while (k < t.length && !isLineTerm(t.charAt(k))) k += 1
      val restLen = t.length - k
      val isFinal = restLen == 0 ||
        (restLen == 1 && isLineTerm(t.charAt(k))) ||
        (restLen == 2 && t.charAt(k) == '\r' && t.charAt(k + 1) == '\n')
      if (isFinal) {
        val cap = t.substring(i + pat.length, k)
        return if (cap.isEmpty) null else cap
      }
      from = i + 1
    }
    null
  }

  /** Inner-XML extraction with the semantics of the Java regex
    * `open(.*)close` (greedy, '.' excludes line terminators): leftmost
    * viable `open`, capture up to the LAST `close` ending on the same
    * line; empty capture → null — the P4 analog of the reference's
    * getInnerXML (pkg/xe/xe.go:785-813). */
  def innerXml(t: String, open: String, close: String): String = {
    var from = 0
    while (true) {
      val i = t.indexOf(open, from)
      if (i < 0) return null
      val start = i + open.length
      var eol = start
      while (eol < t.length && !isLineTerm(t.charAt(eol))) eol += 1
      val j = t.lastIndexOf(close, eol - close.length)
      if (j >= start) {
        val cap = t.substring(start, j)
        return if (cap.isEmpty) null else cap
      }
      from = i + 1
    }
    null
  }

  /** Whitespace-collapse (\s+ → " ") in one pass. */
  def collapseWs(t: String): String = {
    val sb = new java.lang.StringBuilder(t.length)
    var i = 0
    var inWs = false
    while (i < t.length) {
      val c = t.charAt(i)
      if (isWs(c)) { if (!inWs) sb.append(' '); inWs = true }
      else { sb.append(c); inWs = false }
      i += 1
    }
    sb.toString
  }

  final case class Parsed(
    name: String, body: String,
    errorNumber: java.lang.Long, severity: java.lang.Long, state: java.lang.Long,
    client: String, principal: String, app: String, host: String,
    cpuTime: java.lang.Long, duration: java.lang.Long,
    logicalReads: java.lang.Long, physicalReads: java.lang.Long,
    writes: java.lang.Long, rowCount: java.lang.Long, dbId: java.lang.Long,
    signalDuration: java.lang.Long, sessionId: java.lang.Long,
    waitType: String, batch: String,
    elRaw: String, elProc: String, elMsg: String)

  /** Static-forwarder entry for codegen (StaticInvoke generates a direct
    * `FusedParse.parseRow(utf8)` call inside whole-stage codegen — no
    * CodegenFallback interpreter break). */
  def parseRow(input: UTF8String): InternalRow = {
    if (input == null) return null
    val t = input.toString
    val pos = KeyScan.scan(t)
    val p = parseAllWith(t, pos)
    def s(v: String) = if (v == null) null else UTF8String.fromString(v)
    def ks(id: Int) = s(KeyScan.str(t, pos, id))
    InternalRow(
      s(p.name), s(p.body), p.errorNumber, p.severity, p.state,
      s(p.client), s(p.principal), s(p.app), s(p.host),
      p.cpuTime, p.duration, p.logicalReads, p.physicalReads,
      p.writes, p.rowCount, p.dbId, p.signalDuration, p.sessionId,
      s(p.waitType), s(p.batch), s(p.elRaw), s(p.elProc), s(p.elMsg),
      // widened vocabulary (same one-pass scan, new keys)
      ks(KeyScan.DatabaseName), ks(KeyScan.ObjectName),
      ks(KeyScan.ObjectType), ks(KeyScan.FileName),
      KeyScan.num(t, pos, KeyScan.SizeChangeKb), ks(KeyScan.Component),
      ks(KeyScan.DiagState), ks(KeyScan.DiagData),
      ks(KeyScan.ResourceDescription), ks(KeyScan.LockMode),
      ks(KeyScan.ResourceOwnerType),
      KeyScan.num(t, pos, KeyScan.ObjectId),
      ks(KeyScan.Ag), ks(KeyScan.PreviousState), ks(KeyScan.CurrentState),
      ks(KeyScan.CommitPolicy), ks(KeyScan.CommitPolicyTarget),
      ks(KeyScan.SyncState), ks(KeyScan.DdlPhase),
      s(keyToEol(t, "statement=")),
      s(innerXml(t, "xml=<deadlock>", "</deadlock>")),
      s(innerXml(t, "xml=<blocked-process>", "</blocked-process>")),
      ks(KeyScan.IsSystem), ks(KeyScan.CpuPct),
      ks(KeyScan.PlanHandle), ks(KeyScan.FileSize),
      KeyScan.num(t, pos, KeyScan.SessionIdAction),
      ks(KeyScan.ClientAppNameAction),
      s(keyToEol(t, "sql_text=")),
      s(keyToEol(t, "hadr_message=")),
      ks(KeyScan.StateChangeDesc),
      ks(KeyScan.ShutdownOption))
  }

  /** Event-name prefix only (^event=([a-z_0-9]+)) — the cheap extraction
    * the pre-parse filter stage uses (see [[NameLiteExpr]]). */
  def nameOf(t: String): String = {
    if (!t.startsWith("event=")) return ""
    var j = 6
    while (j < t.length && {
      val c = t.charAt(j); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'
    }) j += 1
    t.substring(6, j)
  }

  /** Error number only (group 1 of the triple) — cheap filter extraction. */
  def errorNumberOf(t: String): java.lang.Long = errorTriple(t)._1

  def parseAll(t: String): Parsed = parseAllWith(t, KeyScan.scan(t))

  private def parseAllWith(t: String, pos: Array[Int]): Parsed = {
    // name: ^event=([a-z_0-9]+)
    var name = ""
    if (t.startsWith("event=")) {
      var j = 6
      while (j < t.length && {
        val c = t.charAt(j); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'
      }) j += 1
      name = t.substring(6, j)
    }
    // body: ^event=NAME<space> stripped only when the space is present
    val body =
      if (name.nonEmpty && 6 + name.length < t.length && t.charAt(6 + name.length) == ' ')
        t.substring(7 + name.length)
      else t
    val (en, sev, st) = errorTriple(t)
    val client = clientAddr(t)
    val principal = {
      val p = KeyScan.str(t, pos, KeyScan.Principal)
      if (p != null) p else userQuoted(t)
    }

    // errorlog split (only meaningful for errorlog_written)
    var elRaw: String = null; var elProc: String = null; var elMsg: String = null
    if (name == "errorlog_written") {
      elRaw = collapseWs(body)
      val toks = elRaw.split(" ", -1)
      if (toks.length >= 3) {
        elProc = toks(2).toLowerCase
        val msg0 = if (toks.length > 3) toks.slice(3, toks.length).mkString(" ") else ""
        elMsg = if (elProc == "logon") {
          val mt = msg0.split(" ", -1)
          if (mt.length > 2) mt.slice(2, mt.length).mkString(" ") else ""
        } else msg0
      } else {
        // element_at(toks, 3) is null under non-ANSI when out of bounds;
        // lower(null)=null; message of a <3-token line is ""
        elMsg = ""
      }
    }

    def kn(id: Int) = KeyScan.num(t, pos, id)
    def ks(id: Int) = KeyScan.str(t, pos, id)
    Parsed(name, body, en, sev, st, client, principal,
      ks(KeyScan.App), ks(KeyScan.Host),
      kn(KeyScan.CpuTime), kn(KeyScan.Duration), kn(KeyScan.LogicalReads),
      kn(KeyScan.PhysicalReads), kn(KeyScan.Writes), kn(KeyScan.RowCount),
      kn(KeyScan.DbId), kn(KeyScan.SignalDuration), kn(KeyScan.SessionId),
      ks(KeyScan.WaitType), batchText(t), elRaw, elProc, elMsg)
  }
}

/** The Expression node: text → struct of all parsed fields, one row scan.
  * Codegen emits a direct static call to `FusedParse.parseRow`, so the
  * parse stage stays inside whole-stage codegen (no interpreter break). */
case class ParseTurnExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = FusedParse.schema
  override def nullable: Boolean = true
  override def prettyName: String = "parse_turn"

  override def nullSafeEval(input: Any): Any =
    FusedParse.parseRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FusedParse.parseRow($c);")

  override protected def withNewChildInternal(newChild: Expression): ParseTurnExpr =
    copy(child = newChild)
}

/** Cheap per-row event-name extraction for the PRE-parse filter stage: the
  * filter predicates must not reference the full ParseTurnExpr output,
  * because predicate pushdown substitutes the expensive expression into
  * every predicate (measured: filters cost 3× the parse itself). */
case class NameLiteExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "event_name_lite"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(FusedParse.nameOf(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.FusedParse.nameOf($c.toString()));")
  override protected def withNewChildInternal(newChild: Expression): NameLiteExpr =
    copy(child = newChild)
}

/** Cheap error-number extraction (triple group 1) for the filter stage. */
case class ErrorNumLiteExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "error_number_lite"
  override def nullSafeEval(input: Any): Any =
    FusedParse.errorNumberOf(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val boxed = ctx.freshName("en")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $boxed = graft.functions.FusedParse.errorNumberOf($c.toString());
      if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }""")
  }
  override protected def withNewChildInternal(newChild: Expression): ErrorNumLiteExpr =
    copy(child = newChild)
}
