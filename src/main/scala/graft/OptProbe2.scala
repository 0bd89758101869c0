package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Transcripts

/** Round-6 decomposition probes, wave 2 (scratch tooling). */
object OptProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.prep(spark)
    val synthV = math.abs(Transcripts.synthSql("x").hashCode)
    val staged = s"/tmp/graft_bench_${math.abs(sfDir.hashCode)}_50_32_$synthV"
    val input = spark.read.parquet(staged)
    val parsedB = Pipeline.parse(input)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .crossJoin(spark.range(0, 50L, 1, 32).select(col("id").as("rep")))
      .withColumn("doc_id", col("doc_id") + col("rep") * 1000000L).drop("rep")
      .repartition(64)
    val docs10 = spark.read.parquet(s"$sfDir/documents.parquet")
      .crossJoin(spark.range(0, 10L, 1, 32).select(col("id").as("rep")))
      .withColumn("doc_id", col("doc_id") * 16 + col("rep"))
      .withColumn("text", concat(col("text"), lit(" r"), col("rep")))
      .drop("rep").repartition(64)

    def t(label: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.3f")
    }

    // ---- dq_rules: hugeMethodLimit hypothesis ----
    t("dq-limit8000")(operators.DqRules.ruleAudit(parsedB))
    spark.conf.set("spark.sql.codegen.hugeMethodLimit", "65535")
    t("dq-limit65535")(operators.DqRules.ruleAudit(parsedB))
    spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")

    // ---- bootstrap_ci decomposition ----
    val qc = graft.text.TextAnalysis.qualityColumns(col("text"))
    val base = docs.select(col("doc_id"), qc("stop_permille").as("sp"))
    t("boot-base")(base)
    val fan = base.withColumn("rep", explode(sequence(lit(0L), lit(63L))))
    t("boot-fan")(fan.groupBy("rep").agg(sum("sp")))
    val u = conv(substring(md5(concat_ws("|",
      col("doc_id"), col("rep"), lit("graft-boot"))), 1, 8), 16, 10)
      .cast("long") % 1000000L
    t("boot-fan-md5")(fan.withColumn("u", u).groupBy("rep").agg(sum("u")))
    t("boot-full")(operators.Sampling.bootstrapCI(docs))

    // ---- edit_dedup: post-Lev narrow distinct variant ----
    t("edit-baseline")(dedup.EditDedup.editPairs(docs10))
    t("edit-postlev") {
      // candidatePairs WITHOUT the trailing distinct, Lev first, then a
      // narrow distinct on (ids, dist) — no text in the dedup exchange
      val cell = org.apache.spark.sql.expressions.Window.partitionBy("pfx", "band")
      val b = dedup.EditDedup.blockTable(docs10)
        .withColumn("cell_n", count(lit(1)).over(cell))
        .filter(col("cell_n") <= 64)
      val l = b.select(col("pfx"), col("band"),
        col("doc_id").as("doc_a"), col("text").as("text_a"))
      val r = b.select(col("pfx"), col("band"),
        col("doc_id").as("doc_b"), col("text").as("text_b"))
      l.join(r, Seq("pfx", "band"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("dist",
          dedup.LevBanded.levBanded(col("text_a"), col("text_b"), 20).cast("long"))
        .filter(col("dist") >= 1L)
        .withColumn("max_len",
          greatest(length(col("text_a")), length(col("text_b"))).cast("long"))
        .select("doc_a", "doc_b", "dist", "max_len")
        .distinct()
        .select(col("doc_a"), col("doc_b"), col("dist"),
          (lit(1000L) - expr("dist * 1000 DIV max_len")).as("sim_permille"))
    }

    // ---- bbit decomposition ----
    t("bbit-lsh-cands")(dedup.Dedup.lshCandidates(docs10))
    t("bbit-full")(dedup.Dedup.bbitEstimates(docs10))

    // ---- exact_quantiles second-pass share ----
    t("eq2-full")(operators.Aggregates.exactQuantiles2Pass(parsedB))
    spark.stop()
  }
}
