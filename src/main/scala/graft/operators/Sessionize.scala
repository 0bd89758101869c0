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
}
