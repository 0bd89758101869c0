package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming quota throttle — the continuous twin of
  * [[graft.operators.Sampling.throttle]]: each (event name, hour) cell
  * admits its first `quota` rows ACROSS micro-batches and defers the
  * rest, so a burst that spans triggers still lands exactly `quota` rows
  * on the rate-limited sink.
  *
  * Semantics vs the batch plan: the batch op ranks a cell's rows globally
  * by hash priority; the stream ranks in arrival order, tie-broken inside
  * each micro-batch by the SAME priority — when a cell arrives within one
  * batch the two are row-identical (StreamingSpec proves it), across
  * batches earlier arrivals win (what a live rate limiter must do).
  *
  * Scale design: state is ONE counter per open (name, hour) cell — bytes
  * per cell, cells bounded by |events|·|hours in flight|; an event-time
  * timeout at hour end + slack evicts stale cells so state never grows
  * with history. Keyed on the same (name, hour) the batch plan shuffles
  * on.
  */
object ThrottleStream {

  final case class Ev(name: String, hour: java.sql.Timestamp,
    conv_id: String, turn_idx: Long, gate: Long, ts: java.sql.Timestamp)
  final case class CellCount(seen: Long)
  final case class Verdict(name: String, hour: java.sql.Timestamp,
    conv_id: String, turn_idx: Long, rk: Long, allowed: Boolean)

  def transition(quota: Int)(key: (String, java.sql.Timestamp),
      it: Iterator[Ev], state: GroupState[CellCount]): Iterator[Verdict] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    var seen = state.getOption.map(_.seen).getOrElse(0L)
    val out = it.toSeq.sortBy(e => (e.gate, e.conv_id, e.turn_idx)).map { e =>
      seen += 1
      Verdict(e.name, e.hour, e.conv_id, e.turn_idx, seen, seen <= quota)
    }
    state.update(CellCount(seen))
    // evict the cell once the watermark is past its hour (+1h slack for
    // late arrivals inside the allowed delay)
    state.setTimeoutTimestamp(
      math.max(key._2.getTime + 2L * 3600000L,
        state.getCurrentWatermarkMs() + 1))
    out.iterator
  }

  /** Attach to a parsed turn stream carrying (name, conv_id, turn_idx,
    * ts). */
  def verdicts(stream: DataFrame, quota: Int = 50,
               watermarkDelay: String = "0 seconds")(
      implicit spark: SparkSession): Dataset[Verdict] = {
    import spark.implicits._
    stream
      .select(col("name"),
        date_trunc("hour", col("ts").cast("timestamp")).as("hour"),
        col("conv_id"), col("turn_idx").cast("long").as("turn_idx"),
        graft.operators.Sampling.gatePermille(col("turn_idx")).as("gate"),
        col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[Ev]
      .groupByKey(e => (e.name, e.hour))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(transition(quota))
  }
}
