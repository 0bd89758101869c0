package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.Transcripts
import graft.streaming.{Reliability, StreamingPipeline}

/** startReliable end-to-end: ST6 hot-reload swaps the filter chain
  * mid-query, ST7 graceful stop, ST5 corrupted-checkpoint refusal. */
class StreamingReliabilitySpec extends SparkSpec {

  private def fresh(name: String): String = {
    val p = Paths.get(s"/tmp/graft_relstream_$name")
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(x => Files.delete(x))
    Files.createDirectories(p)
    p.toString
  }

  test("ST6+ST7: mid-query config reload swaps the event blacklist; graceful stop") {
    val root = fresh("reload")
    val t = Transcripts.load(spark, tiny)

    val cfgPath = s"$root/job.json"
    Files.write(Paths.get(cfgPath), """{"excluded_events": []}""".getBytes)
    val reloader = new Reliability.ConfigReloader(cfgPath, quietMs = 0, maxMs = 0)

    // part 1 staged before start
    t.filter(col("conv_id") =!= "conv_hot").limit(2000)
      .repartition(2).write.parquet(s"$root/in")
    val q = StreamingPipeline.startReliable(spark, s"$root/in", s"$root/sinks",
      s"$root/ckpt", reloader = Some(reloader), availableNow = false)
    try {
      q.processAllAvailable()
      def loginCount(): Long = {
        val dir = Paths.get(s"$root/sinks/logstash")
        if (!Files.exists(dir)) 0L
        else spark.read.text(s"$root/sinks/logstash")
          .filter(get_json_object(col("value"), "$.name") === "login").count()
      }
      def totalCount(): Long =
        spark.read.text(s"$root/sinks/logstash").count()
      val logins1 = loginCount()
      val total1 = totalCount()
      assert(logins1 > 0, "part 1 must route login events")

      // hot-reload: exclude logins, then stage part 2
      Files.write(Paths.get(cfgPath), """{"excluded_events": ["login"]}""".getBytes)
      t.filter(col("conv_id") === "conv_hot").limit(2000)
        .repartition(2).write.mode("append").parquet(s"$root/in")
      q.processAllAvailable()

      assert(loginCount() == logins1, "post-reload batches must drop logins")
      assert(totalCount() > total1, "part 2 still routed its other events")

      assert(Reliability.stopGracefully(q))
      assert(!q.isActive)
    } finally if (q.isActive) q.stop()
  }

  test("ST5: a zeroed checkpoint metadata file refuses resume") {
    val root = fresh("corrupt")
    Transcripts.load(spark, tiny).limit(500)
      .repartition(1).write.parquet(s"$root/in")
    val q = StreamingPipeline.startReliable(spark, s"$root/in", s"$root/sinks",
      s"$root/ckpt")
    q.awaitTermination()

    // integrity holds on the healthy checkpoint
    assert(Reliability.checkpointIntegrity(s"$root/ckpt").isRight)

    // zero the newest offsets file — the reference's all-0x00 state corruption
    val offsets = Paths.get(s"$root/ckpt/offsets")
    val latest = Files.list(offsets).iterator()
    var target: java.nio.file.Path = null
    while (latest.hasNext) { val p = latest.next()
      if (p.getFileName.toString.forall(_.isDigit)) target = p }
    Files.write(target, Array.fill[Byte](32)(0))

    val e = intercept[IllegalStateException] {
      StreamingPipeline.startReliable(spark, s"$root/in", s"$root/sinks",
        s"$root/ckpt")
    }
    assert(e.getMessage.contains("zeroed"))
  }
}
