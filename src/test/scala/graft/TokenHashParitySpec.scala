package graft

import org.apache.spark.sql.functions._

/** Parity contract of the fused token-sketch Expression: MinHash
  * signatures, SimHash and fingerprint equal the declarative array
  * expression chains, over the documents corpus AND adversarial strings. */
class TokenHashParitySpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def compareOn(docs: org.apache.spark.sql.DataFrame): Unit = {
    def diff(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Unit = {
      val d1 = a.except(b).collect(); val d2 = b.except(a).collect()
      assert(d1.isEmpty && d2.isEmpty,
        s"fused-only: ${d1.take(2).mkString(";")}\ndecl-only: ${d2.take(2).mkString(";")}")
    }
    diff(dedup.Dedup.signatures(docs), dedup.Dedup.signaturesDeclarative(docs))
    diff(dedup.Dedup.simhashDf(docs), dedup.Dedup.simhashDfDeclarative(docs))
    diff(text.TextAnalysis.fingerprints(docs),
      text.TextAnalysis.fingerprintsDeclarative(docs))
    // fused shingle ARRAY: element-for-element (order included)
    diff(docs.select(col("doc_id"),
        dedup.Dedup.shingleHashes(col("text")).as("sh")),
      docs.select(col("doc_id"),
        dedup.Dedup.shingleHashesDeclarative(col("text")).as("sh")))
  }

  test("fused sketches equal declarative chains over the documents corpus") {
    compareOn(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
  }

  test("fused sketches equal declarative chains on adversarial strings") {
    val cases = Seq(
      "",                       // no tokens: null minhashes, simhash 0, fp 7
      "   ",                    // whitespace only
      "one",                    // 1 token → no shingles
      "one two",                // 2 tokens → no shingles
      "one two three",          // exactly one shingle
      "a b c d e f g h i j",
      "MiXeD CaSe TOKENS here", // lower() parity
      "tab\tsep\nnewline\rcr",  // all \s separators
      "a  double   spaces b c",
      "é ünï côdé pöints more", // non-ASCII codepoints
      "repeat repeat repeat repeat",
      ("w" * 500) + " " + ("x" * 500) + " y"
    )
    val docs = cases.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    compareOn(docs)
  }
}
