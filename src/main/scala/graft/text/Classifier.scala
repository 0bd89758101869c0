package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear text-classifier INFERENCE — the fasttext-style quality-filter
  * shape: a document's score is the sum of per-token weights looked up by
  * token hash, normalized by length into a logit, thresholded into a
  * keep/drop label. At 100 TB classifier inference must be a map-only
  * expression pass (no shuffle, no UDF, weights effectively broadcast) —
  * exactly what this is; the real system swaps the weight function for a
  * trained table, the dataflow is identical.
  *
  * Weights here are a fixed deterministic function of the hash
  * (w(h) = h mod 2001 − 1000 ∈ [−1000, 1000]) so both engines share one
  * definition; all arithmetic is integer-exact except the final logit
  * division (IEEE double over exact integers, then floor).
  */
object Classifier {

  def weight(h: Column): Column = (h % 2001L) - 1000L

  /** (doc_id, n_tokens, score_sum, logit_x1e3, keep). Production path:
    * the fused one-pass [[TokenScore]] kernel (codegen static call). */
  def score(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TokenScore.scoreStruct(col("text")).as("_s"))
      .select(col("doc_id"), col("_s.n_tokens").as("n_tokens"),
        col("_s.score_sum").as("score_sum"))
      .withColumn("logit_x1e3",
        when(col("n_tokens") > 0,
          floor(col("score_sum") * lit(1000.0) / col("n_tokens")).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("keep",
        when(col("logit_x1e3") >= 0, lit(1L)).otherwise(lit(0L)))

  /** Declarative reference for [[score]] — the semantics contract the
    * fused kernel is proven against (ScoreParitySpec). */
  def scoreDeclarative(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextAnalysis.tokHashesDeclarative(col("text")).as("th"))
      .select(col("doc_id"), size(col("th")).cast("long").as("n_tokens"),
        aggregate(col("th"), lit(0L), (acc, h) => acc + weight(h)).as("score_sum"))
      .withColumn("logit_x1e3",
        when(col("n_tokens") > 0,
          floor(col("score_sum") * lit(1000.0) / col("n_tokens")).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("keep",
        when(col("logit_x1e3") >= 0, lit(1L)).otherwise(lit(0L)))

  /** One batch perceptron TRAINING step over bucketed token features —
    * the distributed shape of training the quality filter whose inference
    * is [[score]]. Labels here are the document's `lang == targetLang`
    * membership (production swaps in curated labels; the dataflow is the
    * contract).
    *
    * Features fold into `buckets` hash buckets so the weight vector is a
    * bounded table; initial weights are a deterministic function of the
    * bucket (w0(b) = (31·b+7) mod 2001 − 1000, the [[weight]] convention)
    * so both engines share one definition without a stored model.
    *
    * The step: per doc, margin = Σ_instances w0(b); predict sign(margin);
    * mispredicted docs contribute y to every one of their instances'
    * buckets (classic perceptron update, learning rate 1, integer-exact).
    *
    * Scale shape: the (doc, bucket) instance stream is map-only off the
    * scan and feeds (a) the per-doc margin aggregation and (b) the
    * per-bucket delta aggregation; mistake verdicts rejoin the instance
    * stream on doc_id — both sides already partition by doc_id, and the
    * output is ≤`buckets` rows. The instance explode runs twice (two
    * scans of the source), which at 100 TB is cheaper than materializing
    * a corpus-sized intermediate.
    *
    * Output per bucket seen in the corpus: (bucket, n_instances, w_old,
    * delta, w_new). */
  def trainStep(docs: DataFrame, buckets: Int = 1024,
                targetLang: String = "en"): DataFrame = {
    val inst = docs.select(col("doc_id"),
        when(col("lang") === targetLang, 1L).otherwise(-1L).as("y"),
        explode(TextAnalysis.tokHashes(col("text"))).as("h"))
      .withColumn("b", col("h") % buckets)
      .withColumn("w0", (col("b") * 31L + 7L) % 2001L - 1000L)
    val mistakes = inst.groupBy("doc_id", "y")
      .agg(sum("w0").as("margin"))
      .withColumn("pred", when(col("margin") >= 0, 1L).otherwise(-1L))
      .filter(col("pred") =!= col("y"))
      .select(col("doc_id"), col("y").as("y_m"))
    val deltas = inst.join(mistakes, Seq("doc_id"))
      .groupBy("b").agg(sum("y_m").as("delta"))
    inst.groupBy("b").agg(count(lit(1)).as("n_instances"))
      .join(deltas, Seq("b"), "left")
      .select(col("b").as("bucket"), col("n_instances"),
        ((col("b") * 31L + 7L) % 2001L - 1000L).as("w_old"),
        coalesce(col("delta"), lit(0L)).as("delta"))
      .withColumn("w_new", col("w_old") + col("delta"))
  }

  /** Calibration (reliability-diagram) bins for the quality filter: the
    * EVAL step between [[trainStep]] and [[score]]. Documents are bucketed
    * by predicted logit (fixed `binWidth` bins, floor division so negative
    * logits bin down); per bin: doc count, positives (label = lang
    * membership, the [[trainStep]] convention), observed positive rate
    * and mean logit — a calibrated filter shows pos_rate rising with bin.
    *
    * Shape: ONE map-only pass (label + logit computed per row off the
    * scan, the [[score]] formula inline — no self-join back on doc_id)
    * into one hash-agg bounded by the bin count (~2000/binWidth · 2). */
  def calibrationBins(docs: DataFrame, targetLang: String = "en",
                      binWidth: Long = 10000L): DataFrame =
    docs.select(
        when(col("lang") === targetLang, 1L).otherwise(0L).as("y"),
        TextAnalysis.tokHashes(col("text")).as("th"))
      .select(col("y"), size(col("th")).cast("long").as("n_tokens"),
        aggregate(col("th"), lit(0L), (acc, h) => acc + weight(h)).as("score_sum"))
      .select(col("y"),
        when(col("n_tokens") > 0,
          floor(col("score_sum") * lit(1000.0) / col("n_tokens")).cast("long"))
          .otherwise(lit(0L)).as("logit_x1e3"))
      .withColumn("bin",
        floor(col("logit_x1e3") / lit(binWidth.toDouble)).cast("long"))
      .groupBy("bin").agg(
        count(lit(1)).as("n_docs"),
        sum(col("y")).as("n_pos"),
        floor(sum(col("logit_x1e3")) * lit(1.0) / count(lit(1))).cast("long")
          .as("mean_logit_x1e3"))
      .withColumn("pos_rate_permille",
        floor(col("n_pos") * lit(1000.0) / col("n_docs")).cast("long"))

  /** Inter-rater agreement (Cohen's κ) between the corpus's two quality
    * raters — the heuristic gate (quality_bucket == "ok") and this
    * classifier's keep verdict. Raw agreement is misleading when both
    * raters keep almost everything (agreeing by chance); κ subtracts the
    * chance-agreement floor: κ = (p_o − p_e)/(1 − p_e) with p_e from the
    * marginals. The standard "can I replace the expensive rater with the
    * cheap one" eval before swapping filters on a corpus.
    *
    * Integer-exact: with a=both_keep, b=heur_only, c=clf_only,
    * d=both_drop, n=a+b+c+d, κ's numerator is n·(a+d) − p_e_num and its
    * denominator n² − p_e_num where p_e_num = (a+b)(a+c) + (c+d)(b+d).
    * κ may be negative and floor-vs-truncate integer division diverges on
    * signs, so the output carries |κ|·1000 (DIV, non-negative) plus a
    * sign flag — the q193 rank-agreement convention. Longs hold the
    * arithmetic up to ~3·10⁹ docs per lang; beyond that widen to
    * DECIMAL(38,0) (n² term).
    *
    * Shape: ONE map-only pass (both verdicts per row off the scan — the
    * fused [[TokenScore]] kernel for the classifier side, the quality
    * expression battery for the heuristic side, no doc_id join) into a
    * per-lang hash-agg; everything after is arithmetic on |langs| rows. */
  def raterAgreement(docs: DataFrame): DataFrame = {
    val qc = TextAnalysis.qualityColumns(col("text"))
    val rated = docs.select(col("lang"),
        when(qc("quality_bucket") === "ok", 1L).otherwise(0L).as("h"),
        TokenScore.scoreStruct(col("text")).as("_s"))
      .withColumn("logit_x1e3",
        when(col("_s.n_tokens") > 0,
          floor(col("_s.score_sum") * lit(1000.0) / col("_s.n_tokens"))
            .cast("long"))
          .otherwise(lit(0L)))
      .withColumn("c", when(col("logit_x1e3") >= 0, 1L).otherwise(0L))
    rated.groupBy("lang").agg(
        count(lit(1)).as("n"),
        sum(when(col("h") === 1 && col("c") === 1, 1L).otherwise(0L))
          .as("n_both_keep"),
        sum(when(col("h") === 1 && col("c") === 0, 1L).otherwise(0L))
          .as("n_heur_only"),
        sum(when(col("h") === 0 && col("c") === 1, 1L).otherwise(0L))
          .as("n_clf_only"),
        sum(when(col("h") === 0 && col("c") === 0, 1L).otherwise(0L))
          .as("n_both_drop"))
      .withColumn("agree_permille",
        expr("(n_both_keep + n_both_drop) * 1000 DIV n"))
      .withColumn("pe_num",
        expr("""(n_both_keep + n_heur_only) * (n_both_keep + n_clf_only)
          + (n_both_drop + n_heur_only) * (n_both_drop + n_clf_only)"""))
      .withColumn("kappa_num",
        expr("n * (n_both_keep + n_both_drop) - pe_num"))
      .withColumn("kappa_abs_x1e3",
        expr("abs(kappa_num) * 1000 DIV greatest(n * n - pe_num, 1L)"))
      .withColumn("kappa_positive", col("kappa_num") >= 0)
      .select("lang", "n", "n_both_keep", "n_heur_only", "n_clf_only",
        "n_both_drop", "agree_permille", "kappa_abs_x1e3", "kappa_positive")
  }

  /** Gini split-gain FEATURE AUDIT for the quality filter — which cheap
    * per-doc heuristic (stopword ratio, token-count magnitude,
    * punctuation density) actually explains the classifier's keep/drop
    * verdict? The decision-tree-style informativeness table a curation
    * team reads before replacing the expensive rater with a heuristic
    * gate (the MEASURED complement of [[raterAgreement]], which scores
    * ONE fixed heuristic).
    *
    * Integer-exact Gini — no logs, the entropy stand-in discipline of
    * q224: a cell with n_v docs split (k keep, n_v−k drop) contributes
    *   contrib_micro(v) = (n_v² − k² − (n_v−k)²)·1e6 DIV n_v
    * (= n_v·Gini_v·1e6, DECIMAL(38,0) products so n_v² survives 10¹²
    * rows); split impurity = Σ contrib DIV n; base impurity is the same
    * formula over the single all-corpus cell; gain = base − split.
    * Flooring can push an uninformative feature's gain a few micro
    * below 0 — the value is signed but never divided, so both engines
    * agree bit-for-bit.
    *
    * Shape: label + all three features are ONE map-only expression pass
    * off the scan (fused [[TokenScore]] kernel + the quality battery, no
    * doc_id self-join); a constant fanout-3 map-explode keys (feature,
    * cell) into a grid-bounded hash-agg; per-feature rollup and the base
    * term are arithmetic on that ≤ few-hundred-row grid. */
  def featureGini(docs: DataFrame): DataFrame = {
    val qc = TextAnalysis.qualityColumns(col("text"))
    val row = docs.select(
        TokenScore.scoreStruct(col("text")).as("_s"),
        qc("n_tokens").as("n_tokens"),
        qc("stop_permille").as("sp"),
        qc("n_punct").as("np"))
      .withColumn("logit_x1e3",
        when(col("_s.n_tokens") > 0,
          floor(col("_s.score_sum") * lit(1000.0) / col("_s.n_tokens"))
            .cast("long"))
          .otherwise(lit(0L)))
      .withColumn("keep", when(col("logit_x1e3") >= 0, 1L).otherwise(0L))
      .withColumn("f_stop", expr("sp DIV 100"))
      .withColumn("f_len",
        when(col("n_tokens") > 0,
          length(bin(col("n_tokens"))).cast("long")).otherwise(0L))
      .withColumn("f_punct",
        when(col("n_tokens") > 0,
          expr("np * 1000 DIV n_tokens DIV 100")).otherwise(0L))
    val cells = row.select(col("keep"),
        explode(map(
          lit("stop_bucket"), col("f_stop"),
          lit("len_log2"), col("f_len"),
          lit("punct_bucket"), col("f_punct"))).as(Seq("feature", "cell")))
      .groupBy("feature", "cell").agg(
        count(lit(1)).as("n_v"), sum("keep").as("k_v"))
      .withColumn("contrib_micro", expr(
        """(CAST(n_v AS DECIMAL(38,0)) * n_v - CAST(k_v AS DECIMAL(38,0)) * k_v
          | - CAST(n_v - k_v AS DECIMAL(38,0)) * (n_v - k_v)) * 1000000
          | DIV n_v""".stripMargin))
    cells.groupBy("feature").agg(
        count(lit(1)).as("n_cells"),
        sum("n_v").as("n"), sum("k_v").as("k"),
        sum("contrib_micro").as("sum_contrib"))
      .withColumn("base_micro", expr(
        """CAST((CAST(n AS DECIMAL(38,0)) * n - CAST(k AS DECIMAL(38,0)) * k
          | - CAST(n - k AS DECIMAL(38,0)) * (n - k)) * 1000000
          | DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)""".stripMargin))
      .withColumn("split_micro", expr("sum_contrib DIV n"))
      .withColumn("gain_micro", col("base_micro") - col("split_micro"))
      .select("feature", "n_cells", "base_micro", "split_micro",
        "gain_micro")
  }
}
