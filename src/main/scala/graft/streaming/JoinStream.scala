package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Watermarked STREAM-STREAM inner join — the Structured Streaming
  * capability the rest of the streaming family (fold-style aggregations
  * over checkpointed state) does not exercise: pairing each `user` turn
  * with the `tool` turns that FOLLOW it in the same conversation within
  * an event-time band, while both sides are unbounded streams.
  *
  * State boundedness is the whole design: both inputs carry a watermark
  * and the join condition is a CLOSED time band
  * (`u_ts ≤ t_ts ≤ u_ts + window`), which is exactly what lets Spark
  * derive a state-eviction bound — a buffered user turn is dropped once
  * the tool-side watermark passes `u_ts + window`, so state is
  * proportional to the in-flight window, never to stream history. Omit
  * either the watermark or the band and the join would have to buffer
  * both streams forever; Spark rejects that plan for exactly the reason
  * this operator documents.
  *
  * Cross-batch correctness (the part worth testing): the file source
  * splits input arbitrarily across micro-batches, so a user turn and its
  * tool response may arrive in DIFFERENT batches — the join state carries
  * the pending side across the boundary, and `JoinStreamSpec` proves the
  * drain-append-resume total equals the one-shot batch join exactly.
  *
  * Scale shape: the stream-stream join keys state by conv_id (the equi
  * part), so it shuffles both sides once on conv_id — identical to the
  * batch plan — and the band predicate prunes within the keyed state.
  */
object JoinStream {

  /** The join itself, shared verbatim by the stream and the batch-parity
    * oracle: (conv, user turn) × (conv, tool turn) within the band. */
  def pairs(users: DataFrame, tools: DataFrame,
            windowMinutes: Int = 5): DataFrame =
    users.join(tools,
        expr(s"""u_conv = t_conv AND t_ts >= u_ts
                 AND t_ts <= u_ts + interval $windowMinutes minutes"""))
      .select(col("u_conv").as("conv_id"), col("u_turn"), col("t_turn"),
        col("u_ts"), col("t_ts"))

  /** Role-split views with watermarks (the streaming inputs); also used
    * watermark-free by the batch parity check. */
  def sides(src: DataFrame, lateness: Option[String]): (DataFrame, DataFrame) = {
    def side(role: String, p: String) = {
      // watermarks require TIMESTAMP (not NTZ); the session is pinned
      // UTC (Graft.prep), so the cast is a stable bijection
      val s = src.filter(col("role") === role)
        .select(col("conv_id").as(s"${p}_conv"),
          col("turn_idx").cast("long").as(s"${p}_turn"),
          col("ts").cast("timestamp").as(s"${p}_ts"))
      lateness.map(l => s.withWatermark(s"${p}_ts", l)).getOrElse(s)
    }
    (side("user", "u"), side("tool", "t"))
  }

  /** Start the streaming join: inputDir (parquet file stream) → appended
    * parquet pairs under outDir, resumable from checkpointDir. */
  def start(spark: SparkSession, inputDir: String, outDir: String,
            checkpointDir: String, windowMinutes: Int = 5,
            lateness: String = "10 minutes"): StreamingQuery = {
    graft.Graft.prep(spark)
    val src = spark.readStream.schema(StreamingPipeline.schema)
      .parquet(inputDir)
    val (users, tools) = sides(src, Some(lateness))
    pairs(users, tools, windowMinutes).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** One-shot batch reference: the same `sides`/`pairs` composition on a
    * static frame — the ground truth the streamed pairs must equal. */
  def batchPairs(src: DataFrame, windowMinutes: Int = 5): DataFrame = {
    val (users, tools) = sides(src, None)
    pairs(users, tools, windowMinutes)
  }
}
