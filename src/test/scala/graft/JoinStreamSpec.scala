package graft

import org.apache.spark.sql.functions._
import graft.sources.Transcripts
import graft.streaming.JoinStream

/** Stream-stream join: watermarked user ⋈ tool pairing with bounded
  * state, proven equal to the one-shot batch join across a
  * drain-append-resume boundary (the state must carry pending user turns
  * across micro-batches and checkpoint restarts). */
class JoinStreamSpec extends SparkSpec {
  private def rm(dir: String): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir)).deleteRecursively()
  }

  test("stream-stream join: drain-append-resume equals the one-shot " +
    "batch join; pairs cross the file boundary through join state") {
    val root = "/tmp/graft_join_stream"
    rm(root)
    val t = Transcripts.load(spark, tiny).cache()
    val win = 1440 // minutes; the tiny corpus averages ~43 min between events
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2))
    val expected = JoinStream.batchPairs(t, win).collect().map(key).toSet
    assert(expected.nonEmpty, "batch reference must produce pairs")

    // time-split staging: semantically safe with watermarks (evicted
    // user turns are exactly those no later file can match). Cut at the
    // midpoint of the widest real pair so at least one pair straddles
    // the file boundary by construction
    val u0 = t.filter(col("role") === "user")
      .select(col("conv_id"), col("ts").as("uts"))
    val d0 = t.filter(col("role") === "tool")
      .select(col("conv_id"), col("ts").as("dts"))
    val spans = u0.join(d0, "conv_id")
      .filter(col("dts") >= col("uts") &&
        col("dts") <= col("uts") + expr(s"interval $win minutes"))
      .select("uts", "dts").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0),
        r.getAs[java.time.LocalDateTime](1)))
    val (cu, ct) = spans
      .maxBy(p => java.time.Duration.between(p._1, p._2).toMillis)
    val cut = cu.plus(java.time.Duration.between(cu, ct).dividedBy(2))
    val part1 = t.filter(col("ts") < lit(cut))
    val part2 = t.filter(col("ts") >= lit(cut))
    part1.coalesce(1).write.parquet(s"$root/in/f1")
    JoinStream.start(spark, s"$root/in/*", s"$root/out", s"$root/ckpt",
      windowMinutes = win, lateness = "2 days").awaitTermination()
    part2.coalesce(1).write.parquet(s"$root/in/f2")
    JoinStream.start(spark, s"$root/in/*", s"$root/out", s"$root/ckpt",
      windowMinutes = win, lateness = "2 days").awaitTermination()

    val got = spark.read.parquet(s"$root/out")
    assert(got.collect().map(key).toSet == expected,
      "streamed pairs == batch pairs, exactly")
    // at least one pair straddles the boundary: its user turn was held
    // in join state from the first drain until the tool turn arrived
    val straddling = got
      .filter(col("u_ts").cast("timestamp_ntz") < lit(cut) &&
        col("t_ts").cast("timestamp_ntz") >= lit(cut)).count()
    assert(straddling > 0, "cross-batch pairs prove the state carry-over")
    t.unpersist()
  }
}
