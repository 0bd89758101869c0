package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banned-term auditing — the C4-style blocklist step between cleaning
  * and corpus assembly. Word-boundary, case-folded matching against a
  * small curated term list; the list compiles INTO the plan as constant
  * regexes (the classic tiny-dimension-as-literals broadcast), so the
  * audit is one map-only pass at any corpus size.
  *
  * Terms must be regex-literal (letters/digits/spaces) — they are
  * interpolated into `\bterm\b` patterns shared verbatim with the DuckDB
  * oracle, so both engines run the identical RE2/Java-regex-common
  * pattern.
  */
object Blocklist {

  /** Deterministic fixture list (production swaps in the real list; the
    * dataflow is the contract). */
  val defaultTerms: Seq[String] =
    Seq("click here", "free money", "buy now", "subscribe", "winner",
      "lottery")

  /** Word-boundary, case-folded hit count of one term. */
  def hitCount(text: Column, term: String): Column =
    size(regexp_extract_all(lower(text), lit("\\b" + term + "\\b"), lit(0)))
      .cast("long")

  /** Per-TERM corpus audit: total hits, documents hit, and the permille
    * of documents containing each term — the report that decides whether
    * a term stays on the list (a term hitting 40% of docs is a false
    * positive, one hitting 0.01% is working).
    *
    * Shape: one map-only pass emits a |terms|-length (term, n_hits)
    * struct array per doc; the explode fans out by the CONSTANT term
    * count (not data-dependent) into a |terms|-row hash-agg. */
  def termAudit(docs: DataFrame, terms: Seq[String] = defaultTerms)
      : DataFrame = {
    val entries = array(terms.map(t =>
      struct(lit(t).as("term"), hitCount(col("text"), t).as("n_hits"))): _*)
    docs.select(explode(entries).as("e"))
      .select(col("e.term").as("term"), col("e.n_hits").as("n_hits"))
      .groupBy("term")
      .agg(sum("n_hits").as("n_hits_total"),
        sum(when(col("n_hits") > 0, 1L).otherwise(0L)).as("n_docs_hit"),
        count(lit(1)).as("n_docs"))
      .withColumn("hit_docs_permille",
        expr("n_docs_hit * 1000 DIV n_docs"))
      .select("term", "n_hits_total", "n_docs_hit", "hit_docs_permille")
  }

  /** Per-DOCUMENT gate: total banned hits + flag — the map-only filter
    * the audit calibrates. */
  def docFlags(docs: DataFrame, terms: Seq[String] = defaultTerms)
      : DataFrame =
    docs.select(col("doc_id"),
        terms.map(t => hitCount(col("text"), t)).reduce(_ + _)
          .as("n_banned_hits"))
      .withColumn("flagged", col("n_banned_hits") > 0)
}
