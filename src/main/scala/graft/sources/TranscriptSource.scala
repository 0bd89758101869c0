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

/** S5: typed validation errors — the analog of the reference's per-session
  * catalog/version checks that fail fast with a typed error instead of a
  * downstream cast failure (`pkg/xe/sqlinfo.go` session validation,
  * `pkg/app/program.go` source checks). */
sealed trait SourceError { def msg: String }
final case class MissingColumn(name: String, expected: String) extends SourceError {
  def msg = s"missing required column '$name' (expected $expected)"
}
final case class WrongType(name: String, expected: String, actual: String) extends SourceError {
  def msg = s"column '$name' has type $actual, expected $expected"
}

object TranscriptSource {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.types._

  /** input_hint contract columns; ts is checked by presence only because
    * both TIMESTAMP and TIMESTAMP_NTZ are accepted. */
  val requiredSchema: Seq[(String, DataType)] = Seq(
    "conv_id" -> StringType, "turn_idx" -> IntegerType,
    "role" -> StringType, "text" -> StringType, "tool" -> StringType)

  /** Validate a frame against the transcript contract: all errors are
    * collected and returned typed (not thrown), so a driver can report
    * every problem of a mis-registered source at once. */
  def validate(df: DataFrame): Either[List[SourceError], DataFrame] = {
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val errs = requiredSchema.flatMap { case (n, dt) =>
      fields.get(n) match {
        case None => Some(MissingColumn(n, dt.simpleString))
        case Some(a) if a != dt => Some(WrongType(n, dt.simpleString, a.simpleString))
        case _ => None
      }
    } ++ (if (fields.contains("ts")) Nil
          else List(MissingColumn("ts", "timestamp")))
    if (errs.isEmpty) Right(df) else Left(errs.toList)
  }
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
