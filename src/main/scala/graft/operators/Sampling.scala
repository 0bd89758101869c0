package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling: per-stratum keep rates applied
  * through a hash gate, so the SAME rows are kept on every run, on every
  * engine, at any parallelism — the property `df.sample()` cannot give
  * (its output depends on partition layout). This is the standard corpus
  * re-balancing step (e.g. upweight rare languages, downsample crawl
  * boilerplate) and is a pure per-row filter: no shuffle, fully pushed
  * into the scan stage.
  */
object Sampling {

  /** LCG hash gate in [0, 1000). doc ids are reduced mod P first so the
    * multiply stays far inside Long range at any corpus size. */
  def gatePermille(id: Column): Column =
    ((id % 1000000007L) * 1103515245L + 12345L) % 1000L

  /** Exact-quota reservoir: the k rows with the smallest hash gate per
    * stratum — a deterministic reservoir sample (same k rows on every
    * engine/run/partitioning, unlike a streaming reservoir). One window
    * shuffle keyed on the stratum; ties broken by doc_id so the cut is
    * total. */
  def reservoir(docs: DataFrame, k: Int = 50): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(col("sample_gate"), col("doc_id"))
    docs
      .withColumn("sample_gate", gatePermille(col("doc_id")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("lang"), col("sample_gate"),
        col("rk").cast("long").as("rk"))
  }

  /** Deterministic train/val/test assignment by hash permille: stable
    * under corpus growth (a document's split never changes when other
    * documents are added — the property random split lacks). */
  def split(docs: DataFrame, valPermille: Int = 100,
            testPermille: Int = 100): DataFrame = {
    val g = gatePermille(col("doc_id"))
    docs.select(col("doc_id"), col("lang"),
      when(g < valPermille, "val")
        .when(g < valPermille + testPermille, "test")
        .otherwise("train").as("split"))
  }

  /** Keep a row iff its gate falls under the stratum's permille rate. */
  def stratified(docs: DataFrame, rates: Map[String, Int],
                 defaultPermille: Int = 100): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPermille).cast("long"): Column) {
      case (acc, (k, v)) => when(col("lang") === k, lit(v.toLong)).otherwise(acc)
    }
    docs
      .withColumn("sample_gate", gatePermille(col("doc_id")))
      .filter(col("sample_gate") < rate)
      .select(col("doc_id"), col("lang"), col("sample_gate"))
  }
}
