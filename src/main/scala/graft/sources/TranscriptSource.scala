package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thin source abstraction (SURVEY.md §7): the north rule's input is an
  * Iceberg table of transcripts; this sandbox has no Iceberg runtime jar,
  * so the table is realized as Parquet-backed with identical schema and
  * partition behavior. Swapping in Iceberg is a new implementation of this
  * ONE trait (a `spark.read.table("catalog.db.transcripts")` call site) —
  * no engine code changes.
  */
trait TranscriptSource {
  /** The canonical 6-column transcript frame + lineage columns. */
  def load(spark: SparkSession): DataFrame
}

/** Parquet-backed synthesis source (tests/bench). */
final class SynthTranscriptSource(sfDir: String) extends TranscriptSource {
  def load(spark: SparkSession): DataFrame = Transcripts.load(spark, sfDir)
}

/** Catalog-table source — the production shape (`spark.read.table`), used
  * with an Iceberg (or any V2) catalog configured on the session. */
final class TableTranscriptSource(table: String) extends TranscriptSource {
  def load(spark: SparkSession): DataFrame = {
    graft.Graft.prep(spark)
    spark.read.table(table)
  }
}

/** Multiple sources (the reference polls many servers,
  * `pkg/app/program.go:143-145`): union with a provenance column. */
object TranscriptSources {
  import org.apache.spark.sql.functions._
  def unionAll(spark: SparkSession, sources: Map[String, TranscriptSource]): DataFrame =
    sources.map { case (name, src) =>
      src.load(spark).withColumn("source_name", lit(name))
    }.reduce(_ unionByName _)
}
