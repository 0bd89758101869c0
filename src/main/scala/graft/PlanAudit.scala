package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the key queries — the SURVEY §4
  * audit: pushdown/pruning at the scan, broadcast joins (no shuffle in
  * enrichment), single fused parse/enrich evaluations, equi-join-only ANN
  * paths. `runMain graft.PlanAudit [sfDir] > PLANS.md` captures the
  * artifact the per-round review reads. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.prep(spark)
    def section(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n## $name\n\n```")
      // capture + cap: iterative plans (cluster propagation) unroll to
      // tens of thousands of lines; the audit needs the shape, not all of it
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf)) { df.explain("formatted") }
      val lines = buf.toString("UTF-8").linesIterator.toSeq
      println(lines.take(220).mkString("\n"))
      if (lines.size > 220)
        println(s"... (${lines.size - 220} more lines truncated)")
      println("```")
    }
    println("# PLANS -- formatted physical plans of the key operators")
    println("\nRegenerate with: sbt \"runMain graft.PlanAudit\" > PLANS.md")
    section("routed pipeline (filter -> parse -> enrich -> route, map-only)") {
      Pipeline.routed(spark, sfDir)
        .select("conv_id", "turn_idx", "name", "sink_index", "doc_json")
    }
    section("route_counts (one aggregate pass + derived views)") {
      operators.Routing.perSinkCounts(Pipeline.routed(spark, sfDir))
    }
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    section("ANN near-dup (multi-probe LSH equi-join, no cartesian)") {
      ann.Similarity.nearDupPairs(vecs)
    }
    section("ANN near-dup COLLAPSED (probe on distinct embeddings; member " +
      "pairs expanded only at output via gid equi-joins)") {
      ann.Similarity.nearDupPairsCollapsed(vecs)
    }
    section("IVF assignment (broadcast n-by-k + partial-agg max_by)") {
      ann.Similarity.ivfAssign(vecs)
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    section("MinHash signatures (fused token-sketch expression)") {
      dedup.Dedup.signatures(docs)
    }
    section("bucketed quantized ANN (equi-join on bucket, int8 ranking)") {
      ann.Quantize.bucketedQuantizedTopK(vecs)
    }
    section("sessionize (one conv_id exchange: lag + cumsum + agg)") {
      operators.Sessionize.sessionStats(sources.Transcripts.load(spark, sfDir))
    }
    section("packing (per-(lang, shard) window, no global cumsum)") {
      text.Packing.pack(docs)
    }
    section("tf-idf (persisted tf, broadcast vocabulary-sized df)") {
      text.TfIdf.topTerms(docs)
    }
    section("curation chain (gates -> exact dedup -> LSH banding -> clusters)") {
      dedup.Curation.curate(docs)
    }
    section("boilerplate (shared shingle exchange: hot agg + join probe)") {
      text.Boilerplate.stats(docs)
    }
    section("dup-span coverage (layered windows, no self-join)") {
      text.Boilerplate.dupSpanCoverage(docs)
    }
    section("PQ ADC top-k (broadcast distance tables, map-only scoring)") {
      ann.PQ.adcTopK(vecs)
    }
    section("k-means Lloyd step (two broadcast assigns + centroid agg)") {
      ann.Centroids.kmeansIteration(vecs)
    }
    section("random projection (map-only integer expression)") {
      ann.RandomProjection.project(vecs)
    }
    section("chat render (one conv_id exchange, maxTurns-bounded groups)") {
      operators.Conversations.renderChat(sources.Transcripts.load(spark, sfDir))
    }
    section("BM25 top-k (broadcast query terms; corpus postings never re-shuffle)") {
      text.Bm25.topK(docs)
    }
    section("boilerplate scrub (shingle-keyed exchange + per-row rewrite)") {
      text.Boilerplate.scrub(docs)
    }
    section("semantic dedup (LSH pair probe -> per-vector verdict, no cartesian)") {
      ann.Similarity.semanticDedup(vecs)
    }
    section("quality deciles (tiny (lang, logit) agg + broadcast bucket map)") {
      text.CorpusOps.qualityDeciles(docs)
    }
    section("conversation dedup (conv key agg + 128-bit-keyed group)") {
      operators.Conversations.convDedup(sources.Transcripts.load(spark, sfDir))
    }
    section("preference pairs (conv window -> prompt-key agg, no text in agg)") {
      operators.Conversations.preferencePairs(sources.Transcripts.load(spark, sfDir))
    }
    section("bloom prefilter (8 KB word table broadcast, codegen bit-test probe)") {
      operators.Sketches.bloomPrefilter(docs)
    }
    section("z-order layout (map-only interleave + one <=64-row aggregate)") {
      operators.Layout.layoutStats(docs)
    }
    section("upsert (union + one max_by hash-agg, no join, no window)") {
      val base = sources.Transcripts.load(spark, sfDir)
        .select("conv_id", "turn_idx", "role", "text", "src_file", "src_offset")
      operators.Incremental.upsert(base,
        base.limit(10), Seq("conv_id", "turn_idx"), Seq("src_offset"))
    }
    section("salted equi-join (broadcast hot flags, scatter x replicate)") {
      val t = sources.Transcripts.load(spark, sfDir)
        .select("conv_id", "turn_idx")
      val prof = t.groupBy("conv_id").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_turns"))
      operators.JoinPlanner.saltedEquiJoinAuto(t, prof, "conv_id")
    }
    section("BPE encode (vocabulary folds + broadcast lookup + doc agg)") {
      text.LangModel.bpeEncodeStats(docs)
    }
    section("corpus rollup (one Expand into one exchange)") {
      text.TextAnalysis.corpusRollup(docs)
    }
    section("DSIR weights (<=1024-row rate table broadcast, one doc agg)") {
      text.Selection.dsirWeights(docs)
    }
    section("postings build (window + final agg share one tok exchange)") {
      text.Bm25.postings(docs)
    }
    section("delete propagation (broadcast content-key probe, no self-join)") {
      operators.Governance.deletePropagation(docs)
    }
    section("contamination spans (broadcast eval shingles, matching sliver agg)") {
      text.Decontaminate.spans(docs)
    }
    section("partition-skew audit (one hash-agg to <=nParts rows)") {
      operators.Layout.partitionSkewStats(
        sources.Transcripts.load(spark, sfDir), "conv_id")
    }
    section("edit-distance dedup (prefix+band blocked equi-join, no cartesian)") {
      dedup.EditDedup.editPairs(docs)
    }
    section("triangle count (degree-ordered wedge equi-joins)") {
      graph.Graphs.loginTriangles(Pipeline.parsed(spark, sfDir))
    }
    section("link prediction (wedge self-join + anti-join, aggregate-sized)") {
      graph.Graphs.linkPredict(graph.Graphs.loginCooccurrenceEdges(
        Pipeline.parsed(spark, sfDir)))
    }
    section("as-of join (union-tag, ONE key exchange + window, no broadcast of the big side)") {
      import org.apache.spark.sql.functions._
      val t = sources.Transcripts.loadCanonical(spark, sfDir)
        .filter(col("tool") =!= "")
      val changes = t.filter(col("turn_idx") % 37 === 0)
        .groupBy(col("tool"), col("ts").as("cfg_ts"))
        .agg((max(length(col("text"))).cast("long") % 997L).as("cfg_ver"))
      operators.AsOf.unionAsOf(
        t.select("conv_id", "turn_idx", "tool", "ts"),
        changes, "tool", "ts", "cfg_ts")
    }
    section("action trigrams (one conv window -> distinct -> bounded hash-agg)") {
      operators.Conversations.frequentTrigrams(
        sources.Transcripts.loadCanonical(spark, sfDir))
    }
    section("robust anomaly (one corpus hash-agg; medians on the cached hourly frame)") {
      operators.Aggregates.robustAnomaly(Pipeline.parsed(spark, sfDir))
    }
    section("sorted-neighborhood pairs (block exchange + ONE window per pass, linear candidates)") {
      dedup.SortedNeighborhood.candidates(docs)
    }
    section("mixture sample (aggregate-sized plan broadcast + one source-keyed admit window)") {
      operators.Sampling.mixtureSample(docs)
    }
    section("diversity stats (one shingle explode, count + distinct share the source exchange)") {
      text.CorpusOps.diversityStats(docs)
    }
    section("curriculum interleave (one source-keyed rank window, broadcast source dim)") {
      operators.TrainingExport.curriculumInterleave(docs)
    }
    section("fuzzy decontamination (eval band set broadcast, corpus probes map-side)") {
      text.Decontaminate.fuzzyFlags(docs)
    }
    section("source-overlap matrix (one corpus scan -> per-source HLL register grids)") {
      operators.Sketches.sourceOverlapMatrix(docs)
    }
    section("quality z (map scoring + two bounded histograms, no per-lang value gather)") {
      text.CorpusOps.qualityZ(docs)
    }
    section("hard negatives (anchor broadcast, LSH bucket equi-join, no cartesian)") {
      ann.Similarity.hardNegatives(
        spark.read.parquet(s"$sfDir/embeddings.parquet"))
    }
    section("retrieval eval (hit list broadcast; only queries x k result docs rehydrate)") {
      text.Bm25.retrievalEval(docs)
    }
    section("epoch shuffle (map-side epoch explode + per-(epoch, shard) rank windows)") {
      operators.TrainingExport.epochShuffle(docs)
    }
    section("contamination excision (bench shingles broadcast; corpus cleans itself map-only)") {
      text.Decontaminate.excise(docs)
    }
    section("dup attribution (one (key, source) hash-agg; window on the reduced frame)") {
      dedup.Dedup.dupAttribution(docs)
    }
    section("b-bit screen (LSH candidate equi-join; popcount on packed byte signatures)") {
      dedup.Dedup.bbitEstimates(docs)
    }
    section("prune plan (one fused-score corpus pass into a bucket-bounded histogram)") {
      text.Selection.prunePlanShare(docs)
    }
    section("rater agreement (both verdicts map-side off one scan; |langs| hash-agg)") {
      text.Classifier.raterAgreement(docs)
    }
    section("seasonal anomaly (one corpus hash-agg; per-hod medians on the cached hourly frame)") {
      operators.Aggregates.seasonalAnomaly(Pipeline.parsed(spark, sfDir))
    }
    section("vocab TV-drift (one explode into the vocab-bounded (source, tok) agg; pairwise on the dense grid)") {
      text.CorpusOps.vocabDrift(docs)
    }
    section("inter-arrival Fano ((name, hour) lag window; per-name moment hash-agg)") {
      operators.Aggregates.interArrival(Pipeline.parsed(spark, sfDir))
    }
    section("IVF separation margin (broadcast n-by-k scan over DISTINCT embeddings; top-2 re-attached to member rows by key join)") {
      ann.Similarity.separationMargin(vecs)
    }
    section("lateness profile (per-file running-max window in read order; |names| hash-agg)") {
      operators.Aggregates.latenessProfile(Pipeline.parsed(spark, sfDir))
    }
    section("reword retries (ONE conv window: lag of role + distinct token set; conv hash-agg)") {
      operators.Conversations.rewordRetries(
        sources.Transcripts.loadCanonical(spark, sfDir))
    }
    section("DQ rule audit (rule table compiled into one map pass; 1-row agg unpivoted)") {
      operators.DqRules.ruleAudit(Pipeline.parsed(spark, sfDir))
    }
    section("CUSUM changepoints (one dailyCounts hash-agg; running windows on the per-name aggregate)") {
      operators.Aggregates.cusumChangepoints(Pipeline.parsed(spark, sfDir))
    }
    section("phrase search (broadcast anchor probe; adjacency equi-joins on the anchor sliver)") {
      text.Bm25.phraseSearch(docs)
    }
    section("RRF fusion (two posting-pruned rankers, queriesxk outer join)") {
      text.Bm25.rrfFusion(docs)
    }
    section("release funnel (3 expression gates one pass + content-key agg)") {
      dedup.Curation.releaseFunnel(docs)
    }
    section("winsorized mean (2-pass exact thresholds broadcast + clamp agg)") {
      operators.Aggregates.winsorizedMean(Pipeline.parsed(spark, sfDir))
    }
    section("tournament top-k (per-cell partial windows, tiny final re-rank)") {
      text.TfIdf.vocabTopKScalable(docs)
    }
    section("stream-stream join batch twin (conv-keyed band join)") {
      graft.streaming.JoinStream.batchPairs(
        sources.Transcripts.load(spark, sfDir))
    }
    section("merkle diff (two hash-agg digest pyramids, text never shuffles)") {
      operators.Governance.merkleDiff(docs,
        docs.withColumn("text",
          org.apache.spark.sql.functions.upper(
            org.apache.spark.sql.functions.col("text"))))
    }
    section("rebalance plan (corpus agg -> aggregate-sized interval join)") {
      operators.Layout.rebalancePlan(sources.Transcripts.load(spark, sfDir))
    }
    section("join-order advisor (key histograms + 1-row DECIMAL sums)") {
      import org.apache.spark.sql.functions.col
      val p = Pipeline.parsed(spark, sfDir)
      operators.JoinPlanner.joinOrderAdvisor(
        p.filter(col("name") === "login"),
        p.filter(col("name") === "error_reported"),
        p.filter(col("name") === "wait_info"), "conv_id")
    }
    section("log templates (broadcast keep-set fused rebuild: map-only, " +
      "ONE exchange = the template census)") {
      operators.DqRules.logTemplates(sources.Transcripts.loadCanonical(spark, sfDir))
    }
    section("winnow selection (fused O(n) deque kernel, exchange-free " +
      "off the scan)") {
      import org.apache.spark.sql.functions.col
      docs.select(col("doc_id"), dedup.Winnow.stats(col("text"), 4).as("_w"))
    }
    section("winnow census (only distinct (doc, fp) pairs shuffle; " +
      "text never moves)") {
      dedup.Dedup.winnowStats(docs)
    }
    section("CC star round (symmetrize + shared-exchange min-joins + " +
      "distinct; loop localCheckpoints each round)") {
      import org.apache.spark.sql.functions.col
      graph.Graphs.ccRound(docs.select(col("doc_id").as("a"),
        (col("doc_id") + 1L).as("b")))
    }
    section("max-coverage round (covered set broadcast anti-join + gain " +
      "hash-agg; k driver rounds, nothing corpus-sized on the driver)") {
      import org.apache.spark.sql.functions.{col, explode, array_distinct}
      val ex = docs.select(col("doc_id"), explode(array_distinct(
        dedup.Dedup.shingleHashes(col("text")))).as("tok"))
      text.Selection.maxCoverageRound(ex, Seq(1L, 2L))
    }
    // connectedComponentsStar is a driver fixpoint loop (localCheckpoint
    // per round) — explain would execute it; the per-round plan is the
    // "CC star round" section above.
    // pageRank / labelPropagation / bfsDistances / kCore are driver-side
    // unrolled loops with per-step persist+count — explain would execute
    // them; their per-step plan is the rank ⋈ edges equi-join + dst
    // hash-agg shape shown by the sections above.
    // hits is the same unrolled-loop family (per half-round: edge ⋈
    // score equi-join + vertex agg + 1-row max broadcast).
    spark.stop()
  }
}
