package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-stage cost breakdown of the pipeline (read → parse →
  * enrich → filter → route+json) at local[32] over the staged bench
  * corpus. Guides optimization priority. */
object BenchStages {
  def main(args: Array[String]): Unit = {
    val staged = args.headOption.getOrElse("/tmp/graft_bench_1947788907_50_128")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.prep(spark)
    lazy val input = spark.read.parquet(staged)
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (staged != "skip") {
    val parsed = Pipeline.parse(input)
    t("read")(input)
    t("parse")(parsed)
    t("e:sev_cat")(parsed
      .withColumn("xe_severity_value", functions.Enrich.severityValue)
      .withColumn("xe_category", functions.Enrich.category))
    t("e:desc")(parsed.withColumn("xe_description", functions.Enrich.description))
    t("e:acct")(parsed
      .withColumn("xe_acct_app", functions.Enrich.acctApp)
      .withColumn("xe_acct_app_client", functions.Enrich.acctAppClient))
    t("e:units")(functions.Enrich.withUnits(parsed))
    t("e:flags")(functions.Enrich.withErrorFlags(parsed, spark))
    t("e:entity")(functions.Enrich.withEntityName(parsed, spark))
    t("enrich")(functions.Enrich.enrich(parsed, spark))
    t("filter")(Pipeline.process(input, spark))
    t("routed")(Pipeline.transform(input, spark))
    }
    // scoring-kernel A/B (same session, min-of-2): fused TokenScore
    // static call vs the interpreted higher-order aggregate chain
    args.lift(1).filter(_ == "score").foreach { _ =>
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .crossJoin(spark.range(0, 50L, 1, 32).select(col("id").as("rep")))
        .withColumn("doc_id", col("doc_id") + col("rep") * 1000000L)
        .drop("rep").repartition(64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
      t("score_fused")(graft.text.Classifier.score(docs))
      t("score_fused")(graft.text.Classifier.score(docs))
      t("score_decl")(graft.text.Classifier.scoreDeclarative(docs))
      t("score_decl")(graft.text.Classifier.scoreDeclarative(docs))
      t("quality_z")(graft.text.CorpusOps.qualityZ(docs))
      t("quality_z")(graft.text.CorpusOps.qualityZ(docs))
    }
    // excise A/B (same session, min-of-2 via repeated t calls): the
    // array_except rewrite vs the O(T·M) filter+exists probe scan, on
    // (a) the bench documents corpus (sparse matches — real-corpus shape)
    // and (b) a planted contamination-DENSE fixture: 20k docs × 1200
    // tokens drawn cyclically from a 40-token vocabulary shared with the
    // benchmark stratum, so nearly every token position is covered and
    // M ≈ T (the old form's quadratic worst case).
    args.lift(1).filter(_ == "excise").foreach { _ =>
      // same 10x-replicated corpus shape as Bench's docs10 (the bench
      // decontam_excise input), so the sparse-corpus A/B is faithful
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .crossJoin(spark.range(0, 10L, 1, 8).select(col("id").as("rep")))
        .withColumn("doc_id", col("doc_id") + col("rep") * 1000000L)
        .drop("rep").repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
      t("exc_new_corpus")(graft.text.Decontaminate.excise(docs))
      t("exc_new_corpus")(graft.text.Decontaminate.excise(docs))
      t("exc_old_corpus")(graft.text.Decontaminate.exciseProbeScan(docs))
      t("exc_old_corpus")(graft.text.Decontaminate.exciseProbeScan(docs))
      val dense = spark.range(0, 20000L, 1, 32)
        .select(col("id").as("doc_id"),
          array_join(transform(sequence(lit(0), lit(1199)),
            i => concat(lit("w"), (col("id") + i) % 40)), " ").as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      dense.count()
      t("exc_new_dense")(graft.text.Decontaminate.excise(dense))
      t("exc_new_dense")(graft.text.Decontaminate.excise(dense))
      t("exc_old_dense")(graft.text.Decontaminate.exciseProbeScan(dense))
      t("exc_old_dense")(graft.text.Decontaminate.exciseProbeScan(dense))
      // output-equality spot check on the dense fixture (both forms)
      val a = graft.text.Decontaminate.excise(dense)
      val b = graft.text.Decontaminate.exciseProbeScan(dense)
      println(s"dense rows=${a.count()} diff=${a.exceptAll(b).count() + b.exceptAll(a).count()}")
      // the OTHER round-3 bench outlier (snm_pairs 2.09 -> 3.74 s with
      // code-identical operators): quiet-phase same-session measurement
      // on the bench's own docs10 shape (10x suffix-edit replicas)
      val docsSnm = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .crossJoin(spark.range(0, 10L, 1, 32).select(col("id").as("rep")))
        .withColumn("doc_id", col("doc_id") * 16 + col("rep"))
        .withColumn("text", concat(col("text"), lit(" r"), col("rep")))
        .drop("rep").repartition(64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docsSnm.count()
      t("snm_pairs")(graft.dedup.SortedNeighborhood.similarPairs(docsSnm))
      t("snm_pairs")(graft.dedup.SortedNeighborhood.similarPairs(docsSnm))
      // split timings: candidate generation alone vs the full verify —
      // locates the cost before optimizing either half
      t("snm_cands")(graft.dedup.SortedNeighborhood.candidates(docsSnm))
      t("snm_cands")(graft.dedup.SortedNeighborhood.candidates(docsSnm))
      println("snm candidate rows=" +
        graft.dedup.SortedNeighborhood.candidates(docsSnm).count())
    }
    spark.stop()
  }
}
