package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, language ID, quality scoring, document fingerprinting.
  * All pure `Column` expression trees (higher-order array functions — no
  * UDFs, no shuffles): per-row cost only, embarrassingly parallel at any
  * scale.
  *
  * The cross-engine primitive is [[tokHash]]: a charwise polynomial rolling
  * hash (mod 1e9+7) that both Spark and DuckDB compute identically, giving
  * deterministic token→int mapping without a dictionary join.
  */
object TextAnalysis {

  val P = 1000000007L

  /** Whitespace tokens, lowered, empties dropped — fused native pass
    * ([[FastTok.tokens]]); element-identical to [[tokensDeclarative]]
    * (FastTokSpec). */
  def tokens(text: Column): Column = FastTok.tokens(text)

  /** Declarative reference for [[tokens]] — the semantics contract
    * (kept as the parity anchor; FastTokSpec asserts equality). */
  def tokensDeclarative(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Charwise polynomial hash of one token: fold(7, acc*31 + code) mod P.
    * ASCII-safe; both engines fold left-to-right over codepoints. */
  def tokHash(tok: Column): Column =
    aggregate(
      transform(split(tok, ""), c => ascii(c).cast("long")),
      lit(7L),
      (acc, x) => (acc * 31L + x) % P)

  /** Token-hash array for a text column — fused native pass
    * ([[FastTok.tokHashes]], the TokenHashParitySpec-pinned loop);
    * element-identical to [[tokHashesDeclarative]] (FastTokSpec). */
  def tokHashes(text: Column): Column = FastTok.tokHashes(text)

  /** Declarative reference for [[tokHashes]] — the semantics contract. */
  def tokHashesDeclarative(text: Column): Column =
    transform(tokensDeclarative(text), tokHash _)

  /** BPE-ish sub-token count: runs of letters, runs of digits, single
    * punctuation — the standard pre-tokenizer shape. Fused native walk
    * ([[FastTok.bpeCount]]); count-identical to [[bpeCountDeclarative]]
    * (FastTokSpec). */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeCount(text: Column): Column = FastTok.bpeCount(text)

  /** Declarative reference for [[bpeCount]] — the semantics contract. */
  def bpeCountDeclarative(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  // ---- language ID: marker-word scoring ------------------------------------
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "fr" -> Seq("le", "les", "des", "et", "un"))

  def langScore(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => words.map(w => t === w).reduce(_ || _)))

  /** Predicted language: highest marker score, ties broken by the fixed
    * priority order en > de > es > fr. */
  def langId(text: Column): Column = {
    val scores = markers.map { case (l, ws) => l -> langScore(text, ws) }
    // Priority-ordered arms: lang l wins iff score>0 and >= all others;
    // fold in reverse so the highest-priority language is the outermost arm.
    scores.reverse.foldLeft(lit("und"): Column) { case (acc, (l, s)) =>
      val isMax = scores.collect { case (o, os) if o != l => s >= os }
      when(s > 0 && isMax.reduce(_ && _), lit(l)).otherwise(acc)
    }
  }

  // ---- quality scoring ------------------------------------------------------
  val stopwords = Seq("the", "a", "of", "to", "and", "in", "is", "it", "that", "for")

  def qualityColumns(text: Column): Map[String, Column] = {
    val toks = tokens(text)
    val nTok = size(toks)
    val nStop = size(filter(toks, t => stopwords.map(w => t === w).reduce(_ || _)))
    val nPunct = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
    val stopPermille = when(nTok > 0, expr_div(nStop * 1000, nTok)).otherwise(0L)
    val avgWordLenX10 = when(nTok > 0,
      expr_div(aggregate(toks, lit(0L), (acc, t) => acc + length(t)) * 10, nTok)).otherwise(0L)
    val bucket = when(nTok < 5, "too_short")
      .when(stopPermille >= 400, "boilerplate")
      .when(nPunct * 5 > nTok * 2, "noisy")
      .otherwise("ok")
    Map(
      "n_tokens" -> nTok.cast("long"),
      "n_stopwords" -> nStop.cast("long"),
      "n_punct" -> nPunct.cast("long"),
      "stop_permille" -> stopPermille,
      "avg_word_len_x10" -> avgWordLenX10,
      "quality_bucket" -> bucket)
  }

  /** Integer division on positive longs (parity with DuckDB `//`). */
  private def expr_div(a: Column, b: Column): Column =
    floor(a.cast("double") / b.cast("double")).cast("long")

  // ---- fingerprint: rolling hash over token hashes --------------------------
  /** Document fingerprint: fold(7, acc*131 + tokHash) mod P — stable under
    * whitespace normalization, order-sensitive. Declarative (used only by
    * [[fingerprintsDeclarative]], the TokenHashParitySpec anchor). */
  def fingerprint(text: Column): Column =
    aggregate(tokHashesDeclarative(text), lit(7L), (acc, h) => (acc * 131L + h) % P)

  // ---- query-shaped entry points --------------------------------------------
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      bpeCount(col("text")).cast("long").as("n_bpe"),
      length(col("text")).cast("long").as("n_chars_m"))

  /** Corpus health report per (lang, source): the aggregate a corpus
    * owner monitors — volume, token mass, mean length, quality-gate hit
    * rates and the exact-duplicate count (distinct md5 content keys vs
    * rows). One hash-aggregation pass; all outputs integer-exact. */
  def corpusReport(docs: DataFrame): DataFrame = {
    val qc = qualityColumns(col("text"))
    docs
      .select(col("lang"), col("source"),
        qc("n_tokens").as("n_tokens"), qc("quality_bucket").as("bucket"),
        graft.dedup.Dedup.exactKeyHash(col("text")).as("norm_h"))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        floor(sum(col("n_tokens")).cast("double") / count(lit(1)))
          .cast("long").as("mean_tokens"),
        sum(when(col("bucket") === "ok", 0L).otherwise(1L)).as("n_gated"),
        (count(lit(1)) - countDistinct(col("norm_h"))).as("n_exact_dups"))
  }

  /** Rollup form of the corpus report: per (lang, source) cells PLUS
    * per-lang subtotals and the grand total in ONE pass — the dashboard
    * query every corpus build ends with. Spark plans `rollup` as a single
    * Expand (each row emitted once per grouping set) into one hash-agg —
    * one exchange regardless of how many subtotal levels ride along,
    * where three separate groupBy queries would scan the corpus three
    * times. The `g_lang`/`g_source` grouping flags disambiguate subtotal
    * rows from real NULL dimension values. */
  def corpusRollup(docs: DataFrame): DataFrame = {
    // rollup(col(...)) + expr-based grouping(), NOT rollup("lang", ...):
    // the string overload resolves names through Dataset.col, which tags
    // the attributes with __dataset_id metadata; over a join-staged input
    // the ambiguous-self-join detector then false-positives on the Expand
    // copies (regression-tested in TextOpsSpec on exactly the bench shape)
    docs
      .rollup(col("lang"), col("source"))
      .agg(
        expr("CAST(grouping(lang) AS BIGINT)").as("g_lang"),
        expr("CAST(grouping(source) AS BIGINT)").as("g_source"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        expr("sum(n_chars) DIV count(1)").as("mean_chars"))
  }

  /** WITHIN-document repetition (the Gopher-style quality rule the
    * cross-document boilerplate pass can't see): the fraction of a doc's
    * own token 3-shingles and tokens that are repeats of earlier ones.
    * A looping generator or copy-pasted page scores high even when its
    * content is globally unique. Pure per-row array expressions — map-only,
    * no shuffle, no state; `dup_permille = (n − n_distinct)·1000 DIV n`. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val th = tokHashes(col("text"))
    val base = docs.select(col("doc_id"), th.as("th"),
      graft.dedup.Dedup.shingleHashes(col("text")).as("sh"))
    def dup(n: Column, d: Column): Column =
      when(n > 0, expr_div((n - d) * 1000, n)).otherwise(0L)
    base.select(col("doc_id"),
      size(col("th")).cast("long").as("n_tokens"),
      size(array_distinct(col("th"))).cast("long").as("n_distinct_tokens"),
      dup(size(col("th")).cast("long"),
        size(array_distinct(col("th"))).cast("long")).as("token_dup_permille"),
      size(col("sh")).cast("long").as("n_shingles"),
      dup(size(col("sh")).cast("long"),
        size(array_distinct(col("sh"))).cast("long")).as("shingle_dup_permille"))
  }

  /** Character-CLASS decomposition (permille of alpha / digit / whitespace
    * / other, plus distinct-character count) — the encoding-noise and
    * gibberish detector: mojibake shows as a high `other` share, base64 or
    * hex blobs as alpha+digit with near-zero whitespace, binary spill as a
    * collapsed distinct-char set. Complements [[qualityColumns]] (token
    * level) with the layer below tokens. Map-only expressions. */
  def charClassProfile(docs: DataFrame): DataFrame = {
    val t = col("text")
    val n = length(t).cast("long")
    def cnt(re: String) = size(regexp_extract_all(t, lit(re), lit(0))).cast("long")
    def pm(c: Column) = when(n > 0, expr_div(c * 1000, n)).otherwise(0L)
    docs.select(col("doc_id"), n.as("n_chars_m"),
      // empty-text guard: Java split("") yields [""] where DuckDB yields []
      when(n > 0, size(array_distinct(split(t, ""))).cast("long"))
        .otherwise(0L).as("n_distinct_chars"),
      pm(cnt("[A-Za-z]")).as("alpha_permille"),
      pm(cnt("[0-9]")).as("digit_permille"),
      pm(cnt("\\s")).as("space_permille"),
      pm(cnt("[^A-Za-z0-9\\s]")).as("other_permille"))
  }

  def langIdDf(docs: DataFrame): DataFrame = {
    val scoreCols = markers.map { case (l, ws) =>
      langScore(col("text"), ws).cast("long").as(s"score_$l")
    }
    docs.select((col("doc_id") +: col("lang").as("lang_label") +:
      langId(col("text")).as("lang_pred") +: scoreCols): _*)
  }

  /** Language-label CONFUSION matrix — lang metadata vs [[langId]]'s
    * prediction, per (label, pred) cell with the within-label share. The
    * label-quality audit run before anyone trains per-language models on
    * the `lang` column: a source whose "en" rows predict 30% "de" has a
    * metadata problem, not a language distribution. One map-only pass
    * into a |langs|²-bounded hash-agg; the share window runs on that
    * tiny frame. */
  def langIdConfusion(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    langIdDf(docs)
      .groupBy("lang_label", "lang_pred")
      .agg(count(lit(1)).as("n"))
      .withColumn("label_total",
        sum(col("n")).over(Window.partitionBy("lang_label")))
      .withColumn("share_permille", expr("n * 1000 DIV label_total"))
      .withColumn("is_diagonal", col("lang_label") === col("lang_pred"))
  }

  def quality(docs: DataFrame): DataFrame = {
    val qc = qualityColumns(col("text"))
    docs.select(col("doc_id"),
      qc("n_tokens").as("n_tokens"), qc("n_stopwords").as("n_stopwords"),
      qc("n_punct").as("n_punct"), qc("stop_permille").as("stop_permille"),
      qc("avg_word_len_x10").as("avg_word_len_x10"),
      qc("quality_bucket").as("quality_bucket"))
  }

  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.dedup.TokenHash.sketches(col("text")).getField("fp").as("fp"))

  /** Declarative reference (TokenHashParitySpec). */
  def fingerprintsDeclarative(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))

  /** Markup STRIP — the C4-style HTML cleaner between crawl and corpus:
    * drop script/style blocks wholesale (their content is never training
    * text), strip remaining tags, unescape the common entities (amp LAST,
    * the standard single-pass order so `&amp;lt;` does not double-decode),
    * collapse whitespace. Per doc: the clean text, tag/script counts, and
    * the kept-length permille (a page that is 95% markup is itself a
    * quality signal).
    *
    * Pure regexp chain in the Java-regex/RE2 common subset — map-only,
    * fuses into the scan at any scale. */
  def stripMarkup(docs: DataFrame): DataFrame = {
    val t0 = col("text")
    val blockRe = "(?s)<(script|style)[^>]*>.*?</(script|style)>"
    val tagRe = "<[^>]*>"
    val noBlock = regexp_replace(t0, blockRe, " ")
    val noTags = regexp_replace(noBlock, tagRe, " ")
    val unescaped = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    docs.select(col("doc_id"),
      length(t0).cast("long").as("n_chars_raw"),
      size(regexp_extract_all(noBlock, lit(tagRe), lit(0))).cast("long")
        .as("n_tags"),
      size(regexp_extract_all(t0, lit(blockRe), lit(0))).cast("long")
        .as("n_blocks"),
      trim(regexp_replace(unescaped, "\\s+", " ")).as("clean_text"))
      .withColumn("kept_permille",
        expr("length(clean_text) * 1000 DIV greatest(n_chars_raw, 1)"))
  }

  /** Unicode SCRIPT-MIX profile — the wrong-language-contamination
    * detector [[langId]]'s n-gram heuristic can't see: a doc labeled "en"
    * that is 40% Cyrillic is mislabeled or mojibake regardless of what
    * its Latin trigram stats say. Per doc: permille of Latin / digit /
    * Cyrillic / CJK / whitespace / other codepoints plus the dominant
    * script (precedence latin > digit > cyrillic > cjk > other on ties).
    *
    * Counting is length-minus-stripped with explicit codepoint-range
    * classes (`\x{0400}`-style, the Java-regex/RE2 common syntax; all
    * ranges BMP so Spark's UTF-16 length == DuckDB's codepoint length) —
    * map-only, fuses into the scan. */
  def scriptProfile(docs: DataFrame): DataFrame = {
    val n = length(col("text")).cast("long")
    def cnt(cls: String): Column =
      (n - length(regexp_replace(col("text"), cls, ""))).cast("long")
    def pm(c: Column): Column =
      expr_div(c * 1000, greatest(col("n_chars_total"), lit(1L)))
    val latin = cnt("[A-Za-z]")
    val digit = cnt("[0-9]")
    val cyr   = cnt("[\\x{0400}-\\x{04FF}]")
    val cjk   = cnt("[\\x{4E00}-\\x{9FFF}]")
    val space = cnt("[ \\t\\n\\r\\f]")
    docs.select(col("doc_id"), n.as("n_chars_total"),
        latin.as("n_latin"), digit.as("n_digit"), cyr.as("n_cyrillic"),
        cjk.as("n_cjk"), space.as("n_space"))
      .withColumn("n_other",
        col("n_chars_total") - col("n_latin") - col("n_digit")
          - col("n_cyrillic") - col("n_cjk") - col("n_space"))
      .withColumn("latin_permille", pm(col("n_latin")))
      .withColumn("cyrillic_permille", pm(col("n_cyrillic")))
      .withColumn("cjk_permille", pm(col("n_cjk")))
      .withColumn("dominant_script",
        when(col("n_latin") >= col("n_digit")
            && col("n_latin") >= col("n_cyrillic")
            && col("n_latin") >= col("n_cjk")
            && col("n_latin") >= col("n_other"), "latin")
          .when(col("n_digit") >= col("n_cyrillic")
            && col("n_digit") >= col("n_cjk")
            && col("n_digit") >= col("n_other"), "digit")
          .when(col("n_cyrillic") >= col("n_cjk")
            && col("n_cyrillic") >= col("n_other"), "cyrillic")
          .when(col("n_cjk") >= col("n_other"), "cjk")
          .otherwise("other"))
      .select("doc_id", "n_chars_total", "n_latin", "n_digit",
        "n_cyrillic", "n_cjk", "n_space", "n_other", "latin_permille",
        "cyrillic_permille", "cjk_permille", "dominant_script")
  }
}
