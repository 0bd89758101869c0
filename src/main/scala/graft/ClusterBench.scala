package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Transcripts

/** Cluster benchmark main — submitted via `spark-submit` to a REAL
  * standalone cluster (separate master/worker/executor JVMs), giving the
  * north rule's "N vs 4N executors" criterion genuine multi-executor
  * evidence: the executor count is controlled by
  * `spark.cores.max / spark.executor.cores` on the submit, the input is
  * identical, and each submission prints one JSON line with its measured
  * routed-events/sec and the actual executor count it ran with.
  * `tools/cluster_bench.sh` orchestrates master/worker startup, the two
  * cluster sizes, and the efficiency computation.
  *
  * Unlike [[Bench]] this builder sets NO master — the submit decides —
  * and shuffle partitions come from the env so both cluster sizes run
  * the same logical plan.
  */
object ClusterBench {

  private def timeNoop(df: DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.get("SPARK_GRAFT_REPL").map(_.toInt).getOrElse(50)
    val parts = sys.env.get("SPARK_GRAFT_PARTS").map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .appName("graft-cluster-bench")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "0")
      .getOrCreate()
    Graft.prep(spark)
    spark.sparkContext.setLogLevel("WARN")

    // stage once (same keying as Bench: replicas spread the synth corpus
    // over real file splits; the hot conversation keeps its skew)
    val synthV = math.abs(Transcripts.synthSql("x").hashCode)
    val staged = s"/tmp/graft_cbench_${math.abs(sfDir.hashCode)}_${factor}_${parts}_$synthV"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$staged/_SUCCESS"))) {
      val t = Transcripts.load(spark, sfDir)
      val reps = spark.range(0, factor.toLong, 1, 16).select(col("id").as("rep"))
      reps.crossJoin(broadcast(t)).withColumn("conv_id",
          when(col("conv_id") === "conv_hot", col("conv_id"))
            .otherwise(concat(col("conv_id"), lit("_r"), col("rep"))))
        .drop("rep").repartition(parts).write.mode("overwrite").parquet(staged)
    }

    val input = spark.read.parquet(staged)
    val routed = Pipeline.transform(input, spark)
      .select("conv_id", "turn_idx", "ts", "name", "sink_index", "doc_json")
    // Per-EXECUTOR JIT warmup: C2 compiles the fused-parse codegen in every
    // executor JVM separately, and with many small executors each sees few
    // rows per pass (measured: an 8×2-core submission needs ~5 passes to
    // reach steady state, with a mid-warmup deopt hump). Warm until the
    // pass time stops improving by >10%, then time.
    val rows = routed.count()
    val warm = scala.collection.mutable.ArrayBuffer(timeNoop(routed))
    var done = false
    while (warm.size < 10 && !done) {
      val best = warm.min
      val s = timeNoop(routed)
      warm += s
      done = s > best * 0.9 && s < best * 1.1
    }
    System.err.println(s"warmup: ${warm.map(x => f"$x%.2f").mkString(" ")}")
    val t = math.min(warm.min, math.min(timeNoop(routed), timeNoop(routed)))

    // at the larger cluster size, also exercise a REAL inter-executor
    // shuffle (the W1 ordering exchange) plain vs salted — the skew
    // evidence on genuine multi-JVM block transfers, not local threads
    val executorsNow = spark.sparkContext.getExecutorMemoryStatus.size - 1
    val shuffleTimes = if (executorsNow >= 4) {
      val cached = routed.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      cached.count()
      val plain = cached.repartition(col("conv_id"))
        .sortWithinPartitions("conv_id", "turn_idx")
      val tp = math.min(timeNoop(plain), timeNoop(plain))
      val salted = graft.operators.TurnOrdering
        .saltedRepartition(cached, Seq("conv_hot"), 8)
        .sortWithinPartitions("conv_id", "_salt", "turn_idx")
      val ts = math.min(timeNoop(salted), timeNoop(salted))
      cached.unpersist()
      f""","ordered_plain":$tp%.3f,"ordered_salted":$ts%.3f"""
    } else ""
    val executors =
      spark.sparkContext.getExecutorMemoryStatus.size - 1 // minus driver
    println(f"""{"metric":"cluster_routed_events_per_sec","value":${rows / t}%.1f,"sec":$t%.3f,"rows":$rows,"executors":$executors,"cores_max":"${spark.conf.getOption("spark.cores.max").getOrElse("?")}"$shuffleTimes}""")
    spark.stop()
  }
}
