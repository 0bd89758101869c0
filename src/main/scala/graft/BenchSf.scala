package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Transcripts

/** Scale-exponent bench: the SAME top-10 (by round-3 bench cost)
  * operators timed on sf0.1 and the 10× staged sf1 corpus in ONE
  * session, min-of-2 after a warmup run, with OUTPUT row counts at both
  * scales — the per-query time ratio against the 10× input ratio is the
  * empirical scaling exponent the 100×-scale-up claim rests on
  * (VERDICT r3 #5).
  *
  * Reading the ratios: a map-only or hash-agg query should land ≈10×
  * (linear); the clone-staged sf1 corpus (stage_sf1.py replicates each
  * document/embedding 10× with shifted ids) makes every doc a 10-clique,
  * so PAIR-PRODUCING queries (snm_pairs, semantic_dedup) legitimately
  * grow their OUTPUT superlinearly — that's why row counts ride along:
  * time ratio is judged against output growth, not assumed linear.
  *
  * Usage: runMain graft.BenchSf [sfdirA] [sfdirB]
  * (defaults /root/testdata/sf0.1 and /tmp/graft_sf1 — stage the latter
  * with tools/stage_sf1.py first).
  */
object BenchSf {

  private def timeNoop(df: DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** Driver-loop builders (pagerank/max_coverage/star CC) materialize
    * eagerly inside the call — clock the whole build. */
  private def timeBuild(f: => DataFrame): Double = {
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dirA = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dirB = args.lift(1).getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-bench-sf")
      .config("spark.sql.shuffle.partitions", "32")
      // the staged tables are one-or-few parquet files; without a small
      // split size the scan serializes into a handful of tasks (the same
      // small-file artifact the round-3 sf1 run hit — BASELINE.md)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.prep(spark)
    // spark.driver.memory is launch-time-only in local mode (the JVM is
    // already running under sbt/runMain) — size the heap via
    // `sbt -J-Xmx16g` or JAVA_OPTS. Fail fast instead of silently
    // sweeping sf1 on a starved heap.
    val wantGb = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
      .toLowerCase.stripSuffix("g").toDouble
    val haveGb = Runtime.getRuntime.maxMemory / 1e9
    require(haveGb >= wantGb * 0.75,
      f"driver heap ${haveGb}%.1f GB < required ${wantGb}%.1f GB — launch " +
        "with -J-Xmx (spark.driver.memory cannot resize a running JVM)")

    // (name, input-kind, builder) — input-kind keys the per-dir frames
    def queries(t: DataFrame, docs: DataFrame, vecs: DataFrame)
      : Seq[(String, () => DataFrame, Boolean)] = Seq(
      ("pipeline_routed", () => Pipeline.transform(t, spark)
        .select("conv_id", "turn_idx", "ts", "name", "sink_index", "doc_json"),
        false),
      ("reword_retries", () => operators.Conversations.rewordRetries(t), false),
      ("decontam_excise", () => text.Decontaminate.excise(docs), false),
      ("semantic_dedup", () => ann.Similarity.semanticDedup(vecs), false),
      ("pagerank", () => graph.Graphs.toolPageRank(t), true),
      ("max_coverage", () => text.Selection.maxCoverageSelect(docs), true),
      ("dup_spans", () => text.Boilerplate.dupSpanCoverage(docs), false),
      ("boiler_scrub", () => text.Boilerplate.scrub(docs), false),
      ("term_bursts", () => operators.Conversations.termBursts(t), false),
      ("snm_pairs", () => dedup.SortedNeighborhood.similarPairs(docs), false),
      ("connected_components", () => graph.Graphs.connectedComponentsStar(
        docs.select(col("doc_id").as("a"), (col("doc_id") + 1L).as("b"))
          .filter((col("doc_id") + 1L) % 100 =!= 0)), true))

    // tier 2 (arg "full"): the dedup/ANN/text families most exposed to
    // clique blowup on the clone staging — the sweep that caught
    // semantic_dedup's 120× is worth running over every operator whose
    // candidate space depends on collision statistics
    def tier2(t: DataFrame, docs: DataFrame, vecs: DataFrame)
      : Seq[(String, () => DataFrame, Boolean)] = Seq(
      ("minhash_sigs", () => dedup.Dedup.signatures(docs), false),
      ("lsh_neardup_clusters", () => dedup.Dedup.nearDupClusters(docs), true),
      ("curation", () => dedup.Curation.curate(docs), false),
      ("edit_dedup", () => dedup.EditDedup.editPairs(docs), false),
      ("winnow", () => dedup.Dedup.winnowStats(docs), false),
      ("dup_histogram", () => dedup.Dedup.dupSizeHistogram(docs), false),
      ("bm25_topk", () => text.Bm25.topK(docs, queryMod = 100003), false),
      ("tfidf", () => text.TfIdf.topTerms(docs), false),
      ("lm_score", () => text.LangModel.lmScore(docs), false),
      ("bpe_encode", () => text.LangModel.bpeEncodeStats(docs), false),
      ("injection_scan", () => text.Injection.scan(t), false),
      ("dq_rules", () => operators.DqRules.ruleAudit(Pipeline.parse(t)), false),
      ("log_templates", () => operators.DqRules.logTemplates(t), false),
      ("sessionize", () => operators.Sessionize.sessionStats(t), false),
      ("chat_render", () => operators.Conversations.renderChat(t), false),
      ("conv_dedup", () => operators.Conversations.convDedup(t), false),
      ("branching", () => operators.Conversations.branching(t), false),
      // (brute-force topk deliberately absent: it is the QUADRATIC
      // eval baseline by contract — its 100× on 10× input is the
      // definition of the operator, not a finding)
      ("ivf_topk", () => ann.Similarity.ivfTopK(vecs), false),
      ("ivf_separation", () => ann.Similarity.separationMargin(vecs), false),
      ("kmeans_step", () => ann.Centroids.kmeansIteration(vecs), false),
      // quantized-integer kernels riding VecSqDistExpr (round-5): the
      // codebook crossJoin (n×M×codebook sq-dists) and the k-center
      // selection rounds
      ("pq_adc_topk", () => ann.PQ.adcTopK(vecs), false),
      ("kcenter_select", () => ann.Centroids.kCenterSelect(vecs), false),
      // round-5 session additions: the collapsed encode alone, the
      // fused sign-matrix map pass, and the dense-array Bloom probe
      ("pq_encode", () => ann.PQ.encode(vecs), false),
      ("rand_proj", () => ann.RandomProjection.project(vecs), false),
      ("bloom_prefilter", () => operators.Sketches.bloomPrefilter(docs),
        false),
      // the r3-adjudicated multi-minute sf1 trio (q40/q176/q261): pair
      // output is quadratic in clone multiplicity BY CONTRACT, so the
      // judgment is time ratio vs OUTPUT-row ratio, never vs input
      ("embed_neardup", () =>
        ann.Similarity.nearDupPairsCollapsed(vecs), false),
      ("setsim_join", () =>
        dedup.SetSimJoin.similarPairs(docs, tauPermille = 600L), false),
      ("lsh_sweep", () => dedup.Dedup.lshSweep(docs
        .unionByName(docs.filter(col("doc_id") % 3 === 0)
          .withColumn("doc_id", col("doc_id") + 1100000L)
          .withColumn("text", concat(col("text"), lit(" tail marker"))))
        .unionByName(docs.filter(col("doc_id") % 5 === 0)
          .withColumn("doc_id", col("doc_id") + 2200000L)
          .withColumn("text", concat(col("text"),
            lit(" heavier edit with many extra trailing tokens appended here"
              + " to pull the jaccard into a middle band"))))), false),
      ("hll_sketch", () => operators.Sketches.hllDistinct(Pipeline.parse(t)),
        false),
      ("fuzzy_decontam", () => text.Decontaminate.fuzzyFlags(docs), false))

    val times = scala.collection.mutable.LinkedHashMap[(String, String), Double]()
    val rows = scala.collection.mutable.LinkedHashMap[(String, String), Long]()

    val full = args.lift(2).contains("full")
    // harness-only subset (comma-separated exact names) for targeted
    // re-sweeps of just-touched kernels; full table stays the default
    val only = sys.env.get("GRAFT_BENCHSF_ONLY").map(_.split(",").toSet)
    def visit(tag: String, dir: String): Unit = {
      val t = Transcripts.load(spark, dir)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      val qs = (queries(t, docs, vecs) ++
        (if (full) tier2(t, docs, vecs) else Nil))
        .filter(q => only.forall(_.contains(q._1)))
      for ((name, build, eager) <- qs) {
        // keep the last built frame so the row-count pass reuses it
        // instead of re-running eager driver-loop builders a 4th time
        var lastDf: DataFrame = null
        val run = () =>
          if (eager) timeBuild { lastDf = build(); lastDf }
          else { lastDf = build(); timeNoop(lastDf) }
        run() // warmup (codegen + JIT + shuffle-file cache)
        val best = math.min(run(), run())
        val key = (name, tag)
        times(key) = math.min(times.getOrElse(key, Double.MaxValue), best)
        if (!rows.contains(key)) rows(key) = lastDf.count()
        println(f"[$tag] $name%-22s ${times(key)}%8.2f s  rows=${rows(key)}")
        // operators that persist reused intermediates (lmScore, the
        // clone-collapse group table, CC rounds) must not accumulate
        // cached blocks across a 30-query sweep
        spark.catalog.clearCache()
      }
    }

    // interleave the two scales (A,B,A): host contention comes in
    // minute-scale phases; min across interleaved visits is the
    // contention-free estimate (same discipline as Bench)
    visit("A", dirA); visit("B", dirB); visit("A", dirA)

    val names = (queries(null, null, null) ++
      (if (full) tier2(null, null, null) else Nil)).map(_._1)
      .filter(n => only.forall(_.contains(n)))
    println("\n| query | t(sfA) s | t(sfB) s | time ratio | rows A | rows B | row ratio |")
    println("|---|---|---|---|---|---|---|")
    for (n <- names) {
      val (ta, tb) = (times((n, "A")), times((n, "B")))
      val (ra, rb) = (rows((n, "A")), rows((n, "B")))
      println(f"| $n | $ta%.2f | $tb%.2f | ${tb / ta}%.1f× | $ra | $rb | ${rb.toDouble / math.max(ra, 1)}%.1f× |")
    }
    val qjson = names.map { n =>
      f""""$n":{"t_a":${times((n, "A"))}%.3f,"t_b":${times((n, "B"))}%.3f,"rows_a":${rows((n, "A"))},"rows_b":${rows((n, "B"))}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"sf_scaling","dir_a":"$dirA","dir_b":"$dirB","queries":$qjson}""")
    spark.stop()
  }
}
