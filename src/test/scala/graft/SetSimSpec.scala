package graft

import org.apache.spark.sql.functions._
import graft.dedup.SetSimJoin
import graft.dedup.Dedup

/** Exact set-similarity join (q176): planted pairs and a brute-force
  * completeness proof of the prefix filter. */
class SetSimSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def docsOf(texts: (Long, String)*) =
    texts.toSeq.toDF("doc_id", "text")

  test("similarPairs finds the high-Jaccard pair, rejects the low one") {
    val d = docsOf(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota lambda",
      3L -> "completely different words entirely here now")
    val out = SetSimJoin.similarPairs(d, tauPermille = 600L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 777L) // shingles: 7 shared of 9 distinct
  }

  test("prefix filter is complete: matches brute force on a small corpus") {
    // 24 docs with graded overlap against a 12-token base vocabulary
    val base = Seq("one", "two", "three", "four", "five", "six",
      "seven", "eight", "nine", "ten", "eleven", "twelve")
    val d = docsOf((0 until 24).map { i =>
      val kept = base.drop(i % 4)           // rotate overlap
      val extra = Seq.fill(i % 3)(s"x$i")   // per-doc noise
      i.toLong -> (kept ++ extra).mkString(" ")
    }: _*)
    val tau = 700L
    val fast = SetSimJoin.similarPairs(d, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sets = d.select(col("doc_id"),
      array_distinct(Dedup.shingleHashes(col("text"))).as("ts"))
    val brute = sets.as("a").crossJoin(sets.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        floor(size(array_intersect(col("a.ts"), col("b.ts"))).cast("long") * lit(1000.0)
          / size(array_union(col("a.ts"), col("b.ts"))).cast("long")).cast("long")
          .as("j"))
      .filter(col("j") >= tau).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fast == brute) // exact: no missed pairs, no extras
    assert(brute.nonEmpty)
  }

  test("prefixLen arithmetic: sz - ceil(tau*sz) + 1, integer-exact") {
    val d = Seq((10L, 800L, 3L), (10L, 500L, 6L), (1L, 800L, 1L),
      (7L, 700L, 3L)).toDF("sz", "tau", "want")
    val got = d.select(
      SetSimJoin.prefixLen(col("sz"), 800L).as("p800"),
      col("sz"), col("tau"), col("want")).collect()
    // spot-check the 800-permille column against hand values
    val m = got.map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(m(10L) == 3L) // 10 - ceil(8.0) + 1
    assert(m(1L) == 1L)  // 1 - 1 + 1
    assert(m(7L) == 2L)  // 7 - ceil(5.6) + 1
  }
}
