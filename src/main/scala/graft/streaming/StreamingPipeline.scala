package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.Pipeline
import graft.sinks.Sinks

/** Structured Streaming variant of the pipeline — the analog of the
  * reference's polling service loop (`pkg/app/program.go:140-276`):
  *
  *  - source: file stream over a transcript parquet directory; new files
  *    are the analog of new XE file-target reads (S1). Checkpoint offsets
  *    replace the `(file, offset, status)` state files (ST2,
  *    `pkg/status/status.go:273-363`) — resumable, at-least-once into the
  *    sinks exactly like the reference (sink write precedes state commit).
  *  - transforms: the SAME column pipeline as batch (Pipeline.transform),
  *    applied inside foreachBatch so the per-conversation ordering sort and
  *    the broadcast joins run as plain batch ops per micro-batch.
  *  - sinks: K1/K2/K3 NDJSON writers from one cached routed frame +
  *    per-batch lineage rows `(src_file, offset range, count, batch_id)`
  *    (A7/E11) and observe() counters (A1).
  */
object StreamingPipeline {

  /** Input schema: canonical transcript shape + lineage provenance. */
  val schema: StructType = StructType(Seq(
    StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
    StructField("role", StringType), StructField("text", StringType),
    // NTZ: the batch synthesis yields TIMESTAMP_NTZ from parquet, and the
    // serialized @timestamp must be byte-identical between batch and
    // stream (StreamingSpec multiset test caught TimestampType's 'Z')
    StructField("tool", StringType), StructField("ts", TimestampNTZType),
    StructField("src_file", StringType), StructField("src_offset", LongType)))

  /** Start the streaming pipeline: inputDir → sinks under outRoot, with
    * checkpoint. availableNow=true drains what exists then stops (the
    * one-shot `xelogstash` mode, cmd/xelogstash/main_app.go:41); false
    * polls like the sqlxewriter service loop. */
  def start(spark: SparkSession, inputDir: String, outRoot: String,
            checkpointDir: String, availableNow: Boolean = true,
            maxFilesPerTrigger: Option[Int] = None,
            quarantineDir: Option[String] = None): StreamingQuery = {
    graft.Graft.prep(spark)
    var reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    val src = reader.parquet(inputDir)
      // real per-file lineage from the source itself (E11 analog):
      .withColumn("src_file", regexp_extract(input_file_name(), "([^/]+)$", 1))

    val writer = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // dead-letter quarantine (the rows F7 drops), written per batch
        // BEFORE the happy path so a sink failure can't lose them; the
        // batch=<id> dir overwrite keeps replays effectively-once
        quarantineDir.foreach { qd =>
          graft.operators.Filters.deadLetterRaw(batch)
            .write.mode("overwrite").parquet(s"$qd/batch=$batchId")
        }
        val routed = Pipeline.transform(batch, spark)
          // stable turn ordering before routing (W1): co-locate each
          // conversation, order by turn within it
          .repartition(col("conv_id"))
          .sortWithinPartitions("conv_id", "turn_idx")
        Sinks.writeAll(routed, outRoot, batchId)
        ()
      }
    val q = if (availableNow) writer.trigger(Trigger.AvailableNow()).start()
            else writer.trigger(Trigger.ProcessingTime("5 seconds")).start()
    q
  }

  /** Drain everything currently in inputDir and stop (synchronous). */
  def runOnce(spark: SparkSession, inputDir: String, outRoot: String,
              checkpointDir: String): Unit = {
    val q = start(spark, inputDir, outRoot, checkpointDir, availableNow = true)
    q.awaitTermination()
  }

  /** [[start]] with the reliability surfaces wired in (SURVEY §2.11):
    *
    *  - ST5: an EXISTING checkpoint is integrity-checked before resuming;
    *    damaged state (zeroed/truncated metadata, batch-id gaps) refuses to
    *    start instead of silently replaying from a corrupt cursor.
    *  - ST6: an optional [[Reliability.ConfigReloader]] is polled between
    *    micro-batches; a debounced reload swaps the config-driven event
    *    blacklist + filter rule chain applied to each batch — the
    *    restartless analog of the reference's fsnotify reload.
    *  - ST8: sink writes retry with exponential backoff + jitter instead of
    *    failing the batch on the first transient sink error.
    *
    * ST7 (graceful stop) is [[Reliability.stopGracefully]] on the returned
    * query; ST9 (single instance) is enforced by Spark per checkpoint and
    * can be made explicit with [[Reliability.withInstanceLock]] around the
    * whole run. */
  def startReliable(spark: SparkSession, inputDir: String, outRoot: String,
                    checkpointDir: String,
                    reloader: Option[Reliability.ConfigReloader] = None,
                    maxSinkAttempts: Int = 5, sinkRetryBaseMs: Long = 1000L,
                    availableNow: Boolean = true,
                    maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    import java.nio.file.{Files, Paths}
    if (Files.exists(Paths.get(checkpointDir, "offsets")))
      Reliability.checkpointIntegrity(checkpointDir).swap.foreach(msg =>
        throw new IllegalStateException(s"refusing to resume: $msg"))

    graft.Graft.prep(spark)
    var reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    val src = reader.parquet(inputDir)
      .withColumn("src_file", regexp_extract(input_file_name(), "([^/]+)$", 1))
    val writer = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        reloader.foreach(_.poll())
        val base = Pipeline.transform(batch, spark)
          .repartition(col("conv_id"))
          .sortWithinPartitions("conv_id", "turn_idx")
        val routed = reloader.map(_.current).fold(base) { cfg =>
          base.filter(
            graft.operators.Filters.excludeEvents(cfg.excludedEvents) &&
              graft.operators.Filters.filterChain(cfg.rules))
        }
        Reliability.withRetry(maxSinkAttempts, baseMs = sinkRetryBaseMs) { _ =>
          Sinks.writeAll(routed, outRoot, batchId)
        }
        ()
      }
    if (availableNow) writer.trigger(Trigger.AvailableNow()).start()
    else writer.trigger(Trigger.ProcessingTime("1 second")).start()
  }

  // ---- stateful sampler (A8 via flatMapGroupsWithState) ---------------------
  final case class SampleKey(name: String)
  final case class SampleEvent(name: String, ts: java.sql.Timestamp,
    conv_id: String, turn_idx: Int)
  final case class SampleState(lastBucket: Long)

  /** Streaming sampler: emit the first event per event-name per hour bucket
    * across micro-batches — keyed state replaces the reference's
    * `map[eventName]lastWritten` (`pkg/sink/sampler/sampler.go:51-89`). */
  def samplerFlatMap(
      name: String, it: Iterator[SampleEvent],
      state: GroupState[SampleState]): Iterator[SampleEvent] = {
    val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.conv_id, e.turn_idx))
    var last = state.getOption.map(_.lastBucket).getOrElse(Long.MinValue)
    val out = scala.collection.mutable.ArrayBuffer[SampleEvent]()
    sorted.foreach { e =>
      val bucket = e.ts.getTime / 3600000L
      if (bucket > last) { out += e; last = bucket }
    }
    if (last != Long.MinValue) state.update(SampleState(last))
    out.iterator
  }

  /** Attach the stateful sampler to a parsed stream. */
  def sampled(parsedStream: DataFrame)(implicit spark: SparkSession) = {
    import spark.implicits._
    parsedStream
      .select(col("name"), col("ts"), col("conv_id"), col("turn_idx"))
      .as[SampleEvent]
      .groupByKey(_.name)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(samplerFlatMap)
  }
}
