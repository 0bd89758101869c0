package graft

import org.apache.spark.sql.functions._

/** Fused TokenScore kernel == the declarative aggregate chain — the
  * semantics contract behind Classifier.score / qualityDeciles / qualityZ
  * switching to the one-pass expression. */
class ScoreParitySpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("fused score equals the declarative chain on the corpus") {
    val docs = spark.read.parquet(s"$tiny/documents.parquet")
    val fused = text.Classifier.score(docs)
    val decl = text.Classifier.scoreDeclarative(docs)
    assert(fused.columns.toSeq == decl.columns.toSeq)
    assert(fused.except(decl).count() == 0 && decl.except(fused).count() == 0)
  }

  test("fused score equals the declarative chain on adversarial strings") {
    val docs = Seq(
      (1L, ""), (2L, "   "), (3L, "\t\n\r one  twothree "),
      (4L, "ünïcode tökens ΣΩ mixed 漢字 text"),
      (5L, "a"), (6L, "𝔘𝔫𝔦 supplementary-plane 𝕔𝕙𝕒𝕣𝕤"),
      (7L, (1 to 500).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val fused = text.Classifier.score(docs).collect().sortBy(_.getLong(0))
    val decl = text.Classifier.scoreDeclarative(docs).collect().sortBy(_.getLong(0))
    assert(fused.map(_.toSeq).toSeq == decl.map(_.toSeq).toSeq)
  }

  test("null text scores null through the fused kernel") {
    val docs = Seq((1L, Option("x y")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = text.Classifier.score(docs).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(2L))
    assert(out(2L).isEmpty)
  }
}
