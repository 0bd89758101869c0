package graft.sinks

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** K5: the application-log sink — the reference's own rotating JSON log
  * (`cmd/sqlxewriter/main.go:49-83`, rotator shared with K1,
  * `pkg/sink/rotator.go`): NDJSON lines appended to an hourly file
  * `applog_YYYYMMDD_HH.ndjson`, files older than the retention window
  * deleted. Driver-side (ops logging, not data-plane); the clock is
  * injected so rotation and retention are unit-testable, mirroring the
  * reference's mocked-clock rotator tests (`pkg/sink/rotator_test.go`).
  */
final class AppLog(dir: String, retainHours: Int = 168,
                   clock: () => Instant = () => Instant.now()) {
  private val fmt = DateTimeFormatter.ofPattern("yyyyMMdd_HH")
  Files.createDirectories(Paths.get(dir))

  private def hourStamp(i: Instant): String =
    LocalDateTime.ofInstant(i, ZoneOffset.UTC).format(fmt)

  /** Append one NDJSON log line to the current hour's file. */
  def log(level: String, msg: String): Unit = {
    val now = clock()
    val line = s"""{"ts":"$now","level":"$level","msg":${jsonStr(msg)}}\n"""
    Files.write(Paths.get(dir, s"applog_${hourStamp(now)}.ndjson"),
      line.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Drop log files older than `retainHours` relative to the clock; returns
    * the deleted file names (7-day default, like the reference). */
  def applyRetention(): Seq[String] = {
    val cutoff = hourStamp(clock().minusSeconds(retainHours * 3600L))
    val it = Files.list(Paths.get(dir)).iterator()
    val dropped = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val p = it.next()
      val n = p.getFileName.toString
      if (n.startsWith("applog_") && n.endsWith(".ndjson")) {
        val stamp = n.stripPrefix("applog_").stripSuffix(".ndjson")
        if (stamp < cutoff) { Files.delete(p); dropped += n }
      }
    }
    dropped.toSeq
  }

  private def jsonStr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append("\"").toString
  }
}
