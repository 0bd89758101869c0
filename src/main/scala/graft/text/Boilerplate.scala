package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Corpus-wide boilerplate detection: flag token shingles that recur across
  * many distinct documents (nav bars, license headers, template footers —
  * the C4/RefinedWeb-style repeated-span signal) and score each document by
  * the fraction of its shingles that are corpus-hot.
  *
  * Scale shape (the reason this works at 100 TB):
  *  - the exploded (doc_id, shingle) pair stream feeds BOTH the hot-shingle
  *    aggregate and the per-doc join as the SAME subplan shuffled on the
  *    same key, so ReuseExchange shares one shuffle and the shingle hashing
  *    runs once — no persisted intermediate (see the measurement note in
  *    [[stats]]);
  *  - the hot set is the ≥`minDocs` tail of the shingle frequency
  *    distribution — orders of magnitude smaller than the vocabulary, so the
  *    join back is AQE-broadcastable; the only full shuffles are keyed on
  *    the shingle hash (a long), never on document text;
  *  - per-doc scoring reuses the doc_id clustering the final aggregate
  *    produces; docs too short to shingle surface with zero counts (LEFT
  *    join against the input ids), so downstream filters see every doc.
  *
  * Output: (doc_id, n_shingles, n_hot, boilerplate_permille) — distinct
  * shingles per doc, how many of those are corpus-hot, and the permille
  * ratio (0 for shingle-less docs).
  */
object Boilerplate {

  /** Duplicated-SPAN coverage: how much of each document's token stream is
    * covered by shingles that also occur in other documents — the
    * span-level signal behind exact-substring dedup (Lee et al.'s
    * "Deduplicating Training Data" family): a shingle of width W appearing
    * in ≥`minDocs` docs marks tokens [pos, pos+W) as duplicated; per doc,
    * overlapping marked intervals are MERGED (gaps-and-islands: running
    * max of interval ends over a per-doc window) and the union length is
    * reported as covered tokens + permille coverage.
    *
    * Scale shape: the only corpus-wide exchange is keyed on the shingle
    * hash (long); the interval merge is one per-doc window whose input is
    * just the hot positions (a small fraction of tokens), keyed on doc_id.
    */
  def dupSpanCoverage(docs: DataFrame, minDocs: Int = 2, W: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = docs.select(col("doc_id"),
        posexplode(Dedup.shingleHashes(col("text"))).as(Seq("pos", "s")))
    // round-6: the hot-shingle set via distinct + hash-agg + BROADCAST
    // semi-join, replacing the r3 layered-window form (row_number over
    // (doc, s) then sum over partition s). The windows cost two full
    // sorts of the pair stream, and the partition-by-s window funnels
    // each hot shingle's instances through ONE task — the skew this
    // module exists to avoid. The distinct's map-side partial dedup
    // shrinks the exchange, the groupBy(s) agg is vocabulary-sized, and
    // the probe is map-only: the ≥minDocs shingle set is the repeated-
    // boilerplate vocabulary — sublinear in the corpus, the same pinned-
    // broadcast contract as TfIdf.salientPassage's df table. Measured
    // 3.9 s → 3.3 s isolated at 250k docs (plan: 3 exchanges + 2 sorts
    // → 2 exchanges + 1 sort; the hot side re-runs the shingle explode,
    // a map-only pass — the trade that buys both sorts away).
    // Row-identical: nd(s) ≥ minDocs ⟺ s in hot.
    val hot = pairs.select(col("doc_id"), col("s")).distinct()
      .groupBy("s").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs).select("s")
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val contrib = greatest(lit(0L),
      col("pos") + W - greatest(col("pos"), coalesce(max(col("pos") + W).over(w), lit(0L))))
    val cov = pairs.join(broadcast(hot), Seq("s"), "left_semi")
      .select(col("doc_id"), col("pos").cast("long").as("pos"))
      .withColumn("c", contrib)
      .groupBy("doc_id").agg(sum("c").as("covered"))
    docs.select(col("doc_id"),
        size(graft.text.TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("covered"), lit(0L)).as("covered_dup_tokens"),
        when(col("n_tokens") > 0,
          floor(coalesce(col("covered"), lit(0L)) * lit(1000.0) / col("n_tokens"))
            .cast("long"))
          .otherwise(lit(0L)).as("dup_coverage_permille"))
  }

  /** Boilerplate SCRUB: the transformation counterpart of [[stats]] —
    * rewrite each document with corpus-hot spans REMOVED (the C4-style
    * cleaning step that actually produces the training text, not just a
    * score). A token shingle (width `W`) occurring in ≥`minDocs` distinct
    * documents marks its `W` token positions; the cleaned text is the
    * remaining tokens (lower-cased, space-joined — token normalization is
    * part of this op's contract) in original order.
    *
    * Scale shape: the corpus-wide exchange is keyed on the shingle hash
    * (long) — same shared-pair-stream shape as [[stats]]; the hot-position
    * list rejoins on doc_id, and the REWRITE itself is a per-row array
    * expression over that (small) position list — the document text never
    * shuffles and never self-joins.
    *
    * Output: (doc_id, n_tokens, n_removed, clean_text).
    */
  def scrub(docs: DataFrame, minDocs: Int = 3, W: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = docs.select(col("doc_id"),
      posexplode(Dedup.shingleHashes(col("text"))).as(Seq("pos", "s")))
    // round-6: hot-shingle set via distinct + hash-agg + BROADCAST
    // semi-join (see [[dupSpanCoverage]]'s note — same rewrite, same
    // row-identity argument). The r5 layered-window form paid two full
    // sorts of the pair stream and funneled each hot shingle through one
    // task in the partition-by-s window; the r3-era "130 s" join
    // formulation this module's old comment warned about SHUFFLED the
    // pair stream for the join-back — the broadcast probe does not. The
    // hot set is the ≥minDocs shingle vocabulary (sublinear in corpus,
    // the salientPassage pinned-broadcast contract).
    val hot = pairs.select(col("doc_id"), col("s")).distinct()
      .groupBy("s").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs).select("s")
    val starts = pairs.join(broadcast(hot), Seq("s"), "left_semi")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(col("pos"))).as("starts"))
    docs.join(starts, Seq("doc_id"), "left")
      .select(col("doc_id"), graft.text.TextAnalysis.tokens(col("text")).as("toks"),
        coalesce(col("starts"), array().cast("array<int>")).as("starts"))
      .withColumn("covered", array_distinct(flatten(
        transform(col("starts"), st => sequence(st, st + W - 1)))))
      // kept = positions \ covered via hash-based array_except (order
      // preserved), then index back into the token array — O(T+S) per row
      // vs the O(T·S) filter+exists scan
      .withColumn("kept", array_except(
        when(size(col("toks")) > 0, sequence(lit(0), size(col("toks")) - 1))
          .otherwise(array().cast("array<int>")),
        col("covered")))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("covered")).cast("long").as("n_removed"),
        array_join(transform(col("kept"),
          i => element_at(col("toks"), i + 1)), " ").as("clean_text"))
  }

  def stats(docs: DataFrame, minDocs: Int = 3): DataFrame = {
    // per-doc distinct shingles means the per-shingle row count IS the
    // distinct-doc count (hash aggregation, no sort). The hot aggregate
    // and the join probe are the SAME pair subplan shuffled on the same
    // key, so ReuseExchange shares one shuffle and the shingle hashing
    // runs once — measured faster than both a persisted intermediate
    // (which materializes the full pair stream) and a window-count
    // formulation (which forces a sort the hash-agg avoids): 2.1 s vs
    // 3.4 / 7.4 at 1.25M docs, local[32]
    val pairs = docs.select(col("doc_id"),
      explode(array_distinct(Dedup.shingleHashes(col("text")))).as("sh"))
    val hot = pairs.groupBy("sh").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    val perDoc = pairs.join(hot, Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), count(col("n_docs")).as("n_hot"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_hot"), lit(0L)).as("n_hot"),
        when(coalesce(col("n_shingles"), lit(0L)) > 0,
          floor(coalesce(col("n_hot"), lit(0L)) * lit(1000.0) / col("n_shingles"))
            .cast("long"))
          .otherwise(lit(0L)).as("boilerplate_permille"))
  }
}
