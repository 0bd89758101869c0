package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bucketing, TurnOrdering}
import graft.sources.{SynthTranscriptSource, TranscriptSources}

class BucketingSpec extends SparkSpec {

  test("bucketed co-located join has no shuffle exchange") {
    val t = sources.Transcripts.loadCanonical(spark, tiny)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(t, "graft_bucketed_a", 8)
      Bucketing.writeBucketed(
        t.withColumn("extra", length(col("text"))), "graft_bucketed_b", 8)
      val joined = Bucketing.colocatedJoin(spark, "graft_bucketed_a", "graft_bucketed_b")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_b")
    }
  }

  test("ordered write from bucketed storage is exchange-free (W1 at rest)") {
    val t = sources.Transcripts.loadCanonical(spark, tiny)
    try {
      Bucketing.writeBucketed(t, "graft_bucketed_ord", 8)
      val ordered = Bucketing.orderedFromBucketed(spark, "graft_bucketed_ord")
      val plan = ordered.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"ordering off bucketed storage must not shuffle:\n${plan.take(1200)}")
      // bucketing really clusters: every conversation lives in ONE partition
      val spread = ordered
        .select(col("conv_id"), spark_partition_id().as("pid"))
        .groupBy("conv_id").agg(countDistinct("pid").as("np"))
        .filter(col("np") > 1).count()
      assert(spread == 0, "a conversation crossed bucket partitions")
    } finally spark.sql("DROP TABLE IF EXISTS graft_bucketed_ord")
  }

  test("hot-key detection finds the planted 20% conversation") {
    val t = sources.Transcripts.load(spark, tiny)
    val hot = TurnOrdering.detectHotKeys(t, sharePermille = 100, sampleFraction = 0.5)
    assert(hot.contains("conv_hot"))
    assert(hot.size < 5)
  }

  test("multi-source union stamps provenance (program.go:143-145 analog)") {
    val df = TranscriptSources.unionAll(spark, Map(
      "srcA" -> new SynthTranscriptSource(tiny),
      "srcB" -> new SynthTranscriptSource(tiny)))
    assert(df.count() == 2000)
    assert(df.select("source_name").distinct().count() == 2)
  }

  test("transcript source validation returns typed errors (S4/S5)") {
    import graft.sources.{TranscriptSource, MissingColumn, WrongType}
    import org.apache.spark.sql.functions.col
    val good = graft.sources.Transcripts.load(spark, tiny)
    assert(TranscriptSource.validate(good).isRight)
    val bad = good.drop("role")
      .withColumn("turn_idx", col("turn_idx").cast("string"))
    val errs = TranscriptSource.validate(bad).swap.getOrElse(Nil)
    assert(errs.exists { case MissingColumn("role", _) => true; case _ => false })
    assert(errs.exists { case WrongType("turn_idx", _, _) => true; case _ => false })
  }

  test("zero-value handle skip (P3, xe.go:157-165)") {
    import TestSpark.spark.implicits._
    val df = Seq("0x0000", "0x0A0B", "0000", "0x").toDF("h")
      .select(functions.Grok.zeroHandleToNull(col("h")).as("h"))
    val out = df.collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(None, Some("0x0A0B"), None, None))
  }
}
