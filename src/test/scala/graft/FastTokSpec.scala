package graft

import org.apache.spark.sql.functions._

/** Parity contract of the fused tokenizers ([[graft.text.FastTok]]):
  * token STRING arrays (lowered and raw) and the token-HASH array equal
  * their declarative chains element-for-element (order included), over
  * the documents corpus, the transcript corpus, and adversarial strings.
  * This is what licenses every production call site of
  * TextAnalysis.tokens / tokHashes / FastTok.rawTokens to use the fused
  * pass while the oracle SQL keeps the declarative semantics. */
class FastTokSpec extends SparkSpec {
  import TestSpark.spark.implicits._
  import graft.text.{FastTok, TextAnalysis}

  private def compareOn(df: org.apache.spark.sql.DataFrame): Unit = {
    val t = df.select(
      col("text"),
      FastTok.tokens(col("text")).as("f_tok"),
      TextAnalysis.tokensDeclarative(col("text")).as("d_tok"),
      FastTok.rawTokens(col("text")).as("f_raw"),
      filter(split(col("text"), "\\s+"), x => x =!= "").as("d_raw"),
      FastTok.tokHashes(col("text")).as("f_th"),
      TextAnalysis.tokHashesDeclarative(col("text")).as("d_th"),
      FastTok.bpeCount(col("text")).as("f_bpe"),
      TextAnalysis.bpeCountDeclarative(col("text")).as("d_bpe"))
    val bad = t.filter(
      col("f_tok") =!= col("d_tok") || col("f_raw") =!= col("d_raw") ||
        col("f_th") =!= col("d_th") || col("f_bpe") =!= col("d_bpe")).collect()
    assert(bad.isEmpty, s"mismatch: ${bad.take(3).mkString(";")}")
  }

  test("fused tokenizers equal declarative chains over the corpora") {
    compareOn(spark.read.parquet(s"$tiny/documents.parquet"))
    compareOn(sources.Transcripts.load(spark, tiny).select("text"))
  }

  test("fused kv extraction equals regexp_extract_all") {
    def compareKv(df: org.apache.spark.sql.DataFrame): Unit = {
      val bad = df.select(col("text"),
          operators.KvExtract.kvs(col("text")).as("f"),
          regexp_extract_all(col("text"),
            lit("([a-z_0-9]+)=([^ ]*)"), lit(0)).as("d"))
        .filter(col("f") =!= col("d")).collect()
      assert(bad.isEmpty, s"kv mismatch: ${bad.take(3).mkString(";")}")
    }
    compareKv(sources.Transcripts.load(spark, tiny).select("text"))
    compareKv(Seq(
      "", "no pairs here", "a=1", "a=1 b=2", "a= b=", "a==b c=d=e",
      "UPPER=1 mIx=2", "1ab=x -x=y _=z", "a=1\tb=2\nc=3", "tail=val ",
      "x=😀y a=😀=z", "key=v=with=eq  double  spaces=1")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text"))
  }

  test("fused intersect-size equals size(array_intersect)") {
    val docs = spark.read.parquet(s"$tiny/documents.parquet")
      .select(col("doc_id"), graft.text.FastTok.tokens(col("text")).as("a"))
    val pairs = docs.withColumn("b",
        org.apache.spark.sql.functions.reverse(col("a")))
      .unionByName(docs.crossJoin(
        Seq(Seq("the", "the", "of", "zz"), Seq.empty[String], Seq("é", "😀"))
          .toDF("b")))
    val bad = pairs.select(
        graft.text.ArrIntersectSize.of(col("a"), col("b")).as("f"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("d"))
      .filter(col("f") =!= col("d")).collect()
    assert(bad.isEmpty, s"intersect-size mismatch: ${bad.take(3).mkString(";")}")
  }

  test("fused tokenizers equal declarative chains on adversarial strings") {
    val cases = Seq(
      "", "   ", "\t\n\f\r", "one", " leading", "trailing ",
      "a  double   spaces b c", "MiXeD CaSe TOKENS here",
      "tab\tsep\nnewline\rcr", "é ünï côdé pöints more",
      "😀 emoji 😁pair", "0x00=1 key=value a=b=c",
      ("w" * 500) + " " + ("x" * 500) + " y")
    compareOn(cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text"))
  }
}
