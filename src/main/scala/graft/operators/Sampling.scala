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
