package graft

import org.apache.spark.sql.functions._

/** Parity contract of the fused char-n-gram kernel ([[graft.dedup.CharNgrams]])
  * against the declarative lower → \s+-collapse → per-char split →
  * window-fold chain, over the documents corpus AND adversarial strings,
  * for several n. */
class CharNgramParitySpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def diff(docs: org.apache.spark.sql.DataFrame, n: Int): Unit = {
    val a = docs.select(col("doc_id"),
      dedup.Dedup.charNgramHashes(col("text"), n).as("ng"))
    val b = docs.select(col("doc_id"),
      dedup.Dedup.charNgramHashesDeclarative(col("text"), n).as("ng"))
    val d1 = a.except(b).collect(); val d2 = b.except(a).collect()
    assert(d1.isEmpty && d2.isEmpty,
      s"n=$n fused-only: ${d1.take(2).mkString(";")}\ndecl-only: ${d2.take(2).mkString(";")}")
  }

  test("fused char n-grams equal declarative over the documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (n <- Seq(3, 5)) diff(docs, n)
  }

  test("fused CDC boundary stats equal declarative over corpus + edges") {
    def diffCdc(docs: org.apache.spark.sql.DataFrame, mod: Int, n: Int): Unit = {
      val a = text.Packing.cdcStats(docs, mod, n)
      val b = text.Packing.cdcStatsDeclarative(docs, mod, n)
      val d1 = a.except(b).collect(); val d2 = b.except(a).collect()
      assert(d1.isEmpty && d2.isEmpty,
        s"mod=$mod n=$n fused-only: ${d1.take(2).mkString(";")}\ndecl-only: ${d2.take(2).mkString(";")}")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    diffCdc(docs, 64, 5)
    diffCdc(docs, 16, 3)
    val edge = Seq((0L, "", "en", "s", 0L), (1L, "   ", "en", "s", 3L),
      (2L, "abcd", "en", "s", 4L), (3L, " x  y\tz ", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    diffCdc(edge, 64, 5)
  }

  test("fused char n-grams equal declarative on adversarial strings") {
    val cases = Seq(
      "",                      // empty: both sides empty array
      " ",                     // ws-only: collapses to single space, no grams
      "   \t\n  ",             // multi-ws run incl. tab/newline
      "ab",                    // shorter than n
      "abcde",                 // exactly one 5-gram
      "abcdef",                // two 5-grams
      " lead and trail ",      // leading/trailing space KEPT as one space
      "MiXeD CaSe",            // lower() parity
      "a  b   c d",            // interior runs collapse
      "é ünï côdé pöints",     // non-ASCII codepoints
      "tabs\tand\r\nnewlines here",
      ("x" * 300) + " y " + ("z" * 300))
    val docs = cases.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    for (n <- Seq(2, 5)) diff(docs, n)
  }
}
