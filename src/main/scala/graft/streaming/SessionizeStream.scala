package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-sessionization — the continuous twin of
  * [[graft.operators.Sessionize]]: conversations arrive as an unbounded
  * turn stream and a session is CLOSED (emitted) either when a later turn
  * of the same conversation arrives past the gap, or when the event-time
  * watermark passes the session's end + gap (event-time timeout, so idle
  * conversations don't pin state forever).
  *
  * Scale design: state is one tiny fixed-size record per OPEN conversation
  * (not per turn), keyed on conv_id — the same key the batch path
  * shuffles on. Emission is append-mode: each closed session is output
  * exactly once, which is what a downstream training-data writer wants.
  */
object SessionizeStream {

  final case class TurnEvent(conv_id: String, turn_idx: Int,
    ts: java.sql.Timestamp)
  /** State timestamps are MICROSECONDS since epoch — Timestamp.getTime
    * milliseconds would silently truncate the corpus' microsecond ts and
    * break equality with the batch sessionizer. */
  final case class OpenSession(sessionIdx: Long, startUs: Long, lastUs: Long,
    nTurns: Long)
  final case class SessionRow(conv_id: String, session_idx: Long,
    n_turns: Long, ts_start: java.sql.Timestamp, ts_end: java.sql.Timestamp)

  private def micros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def toRow(convId: String, s: OpenSession): SessionRow =
    SessionRow(convId, s.sessionIdx, s.nTurns,
      fromMicros(s.startUs), fromMicros(s.lastUs))

  /** Per-conversation state transition. Turns inside a batch are sorted by
    * (ts, turn_idx) so in-batch gaps close sessions immediately; the open
    * tail is kept in state with a timeout at last + gap. */
  def transition(gapUs: Long)(convId: String, it: Iterator[TurnEvent],
      state: GroupState[OpenSession]): Iterator[SessionRow] = {
    val out = ArrayBuffer[SessionRow]()
    var open = state.getOption
    val turns = it.toSeq
    if (turns.isEmpty) {
      if (state.hasTimedOut && open.isDefined) {
        out += toRow(convId, open.get)
        state.remove()
      }
    } else {
      turns.sortBy(e => (micros(e.ts), e.turn_idx)).foreach { e =>
        val t = micros(e.ts)
        open = open match {
          case Some(s) if t > s.lastUs + gapUs =>
            out += toRow(convId, s)
            Some(OpenSession(s.sessionIdx + 1, t, t, 1))
          case Some(s) =>
            Some(s.copy(lastUs = math.max(t, s.lastUs), nTurns = s.nTurns + 1))
          case None =>
            Some(OpenSession(1, t, t, 1))
        }
      }
      state.update(open.get)
      // timeout API is millisecond-granular: round UP so the session never
      // closes before its microsecond-exact gap has truly elapsed, and
      // clamp at-or-after the current watermark as the API requires
      val timeoutMs = math.floorDiv(open.get.lastUs + gapUs + 999L, 1000L)
      state.setTimeoutTimestamp(
        math.max(timeoutMs, state.getCurrentWatermarkMs() + 1))
    }
    out.iterator
  }

  /** Attach to a transcript stream (conv_id, turn_idx, ts). `ts` is cast
    * to TIMESTAMP for the watermark (session tz pinned UTC — see
    * StreamingPipeline.schema on NTZ). */
  def sessions(stream: DataFrame, gapMinutes: Int = 30,
               watermarkDelay: String = "0 seconds")(
      implicit spark: SparkSession): Dataset[SessionRow] = {
    import spark.implicits._
    stream
      .select(col("conv_id"), col("turn_idx").cast("int").as("turn_idx"),
        col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[TurnEvent]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        transition(gapMinutes * 60000000L))
  }
}
