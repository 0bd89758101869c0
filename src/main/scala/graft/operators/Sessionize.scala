package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the time since the
  * previous turn of the same conversation exceeds the gap — the standard
  * training-data segmentation step (conversation stream → session
  * documents), absent from the reference but core to a transcript corpus
  * pipeline.
  *
  * Scale design: ONE shuffle keyed on conv_id — the same clustering the
  * ordering stage (W1) already uses, so at 100 TB the exchange is shared.
  * Both window passes (lag + running sum) and the per-session aggregation
  * run on that one clustering: HashPartitioning(conv_id) satisfies the
  * ClusteredDistribution of groupBy(conv_id, session_idx), so no second
  * exchange appears. Timestamps are compared AS timestamps
  * (prev + INTERVAL), never cast to epoch numerics — both engines agree
  * exactly, no rounding hazards.
  */
object Sessionize {

  /** Per-turn session index (1-based) within its conversation. */
  def withSessionIdx(df: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val prevTs = lag(col("ts"), 1).over(w)
    val isNew = when(prevTs.isNull ||
      col("ts") > prevTs + expr(s"INTERVAL $gapMinutes MINUTES"), 1L).otherwise(0L)
    df.withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session stats: turn count and time span. */
  def sessionStats(df: DataFrame, gapMinutes: Int = 30): DataFrame =
    withSessionIdx(df, gapMinutes)
      .groupBy(col("conv_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_turns"),
        min(col("ts")).as("ts_start"), max(col("ts")).as("ts_end"))

  /** Peak-concurrency profile — "how many conversations were open at
    * once, per day": the sweep line (+1 at each conversation's first
    * turn, −1 at its last; inclusive interval semantics, so starts sort
    * before ends at the same instant) run as a DISTRIBUTED block prefix
    * sum. A naive sweep orders ALL events in one partition — a single-
    * task sort at any scale. Instead: the within-day running sums are a
    * day-partitioned window; each day's OPENING concurrency is the
    * prefix sum of per-day net deltas — a window over the tiny day
    * aggregate — and the day's true peak is opening + within-day max.
    * Capacity planning / rate-limit sizing read straight off this.
    *
    * Days with no start/end events (a long conversation silently
    * spanning them) emit no row — the profile covers observed days.
    *
    * Scale shape: one conv_id hash-agg (the span extraction), one
    * day-keyed exchange for the within-day windows, then all remaining
    * math on the |days| aggregate. Tie groups carry identical deltas,
    * so every prefix max is partition-order-independent. */
  def concurrencyProfile(parsed: DataFrame): DataFrame = {
    val spans = parsed.groupBy("conv_id")
      .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
    val ev = spans.select(col("t0").as("t"), lit(1L).as("delta"))
      .unionByName(spans.select(col("t1").as("t"), lit(-1L).as("delta")))
      .withColumn("day_num",
        (unix_timestamp(col("t")) / 86400L).cast("long"))
    val inDay = Window.partitionBy("day_num")
      .orderBy(col("t"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perDay = ev.withColumn("run", sum(col("delta")).over(inDay))
      .groupBy("day_num")
      .agg(sum(col("delta")).as("net"), max(col("run")).as("peak_rel"))
    val openW = Window.orderBy("day_num")
      .rowsBetween(Window.unboundedPreceding, -1)
    perDay
      .withColumn("opening", coalesce(sum(col("net")).over(openW), lit(0L)))
      .select(col("day_num"), col("opening"),
        (col("opening") + col("peak_rel")).as("peak"), col("net"))
  }
}
