package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tool-call latency: pair each assistant turn with the tool turn that
  * immediately follows it in the same conversation and measure the
  * event-time gap — the request→response monitoring surface for agent
  * rollouts.
  *
  * Batch form: one lead() window per conversation — no join at all.
  * Streaming form: the SAME semantics as a watermarked STREAM-STREAM
  * equi-join on (conv_id, turn_idx+1) with a bounded event-time range —
  * the Structured Streaming shape required when request and response
  * arrive in different micro-batches (a lead() window cannot cross
  * batches). Join state is bounded by the watermark horizon on both
  * sides; the range bound makes the pairing identical to the batch form
  * (StreamingSpec proves result equality on the same staged input).
  */
object LatencyStream {

  /** Batch reference: (conv_id, turn_idx, latency_s) for every
    * assistant→tool adjacent pair within `maxLatencyMinutes`. */
  def toolLatencyBatch(t: DataFrame, maxLatencyMinutes: Int = 60): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t.select(col("conv_id"), col("turn_idx"), col("role"), col("ts"))
      .withColumn("next_role", lead(col("role"), 1).over(w))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .filter(col("role") === "assistant" && col("next_role") === "tool")
      .withColumn("latency_s",
        unix_timestamp(col("next_ts").cast("timestamp")) -
          unix_timestamp(col("ts").cast("timestamp")))
      .filter(col("latency_s") >= 0L &&
        col("latency_s") <= maxLatencyMinutes * 60L)
      .select(col("conv_id"), col("turn_idx"), col("latency_s"))
  }

  /** Streaming form over a turn stream (same schema as the batch input).
    * `maxLatencyMinutes` bounds both the join's event-time range and the
    * watermark (state retention) on both sides. */
  def toolLatencyStream(stream: DataFrame,
                        maxLatencyMinutes: Int = 60): DataFrame = {
    val horizon = s"$maxLatencyMinutes minutes"
    val evt = stream.withColumn("ts_evt", col("ts").cast("timestamp"))
    val req = evt.filter(col("role") === "assistant")
      .select(col("conv_id").as("req_conv"), col("turn_idx").as("req_turn"),
        col("ts_evt").as("req_ts"))
      .withWatermark("req_ts", horizon)
    val resp = evt.filter(col("role") === "tool")
      .select(col("conv_id").as("resp_conv"), col("turn_idx").as("resp_turn"),
        col("ts_evt").as("resp_ts"))
      .withWatermark("resp_ts", horizon)
    req.join(resp,
        col("req_conv") === col("resp_conv") &&
        col("resp_turn") === col("req_turn") + 1 &&
        col("resp_ts") >= col("req_ts") &&
        col("resp_ts") <= col("req_ts") + expr(s"INTERVAL $maxLatencyMinutes MINUTES"))
      .select(col("req_conv").as("conv_id"), col("req_turn").as("turn_idx"),
        (unix_timestamp(col("resp_ts")) - unix_timestamp(col("req_ts")))
          .as("latency_s"))
  }
}
