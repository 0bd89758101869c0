package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Dedup + text-analysis behavior tests on crafted fixtures (the oracle
  * checks cover the synthetic corpus; these cover the semantics edges). */
class DedupSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def docsOf(texts: (Long, String)*) =
    texts.toSeq.toDF("doc_id", "text")

  test("exact dedup groups whitespace/case variants") {
    val d = docsOf(1L -> "Hello  World", 2L -> "hello world", 3L -> "other doc")
    val out = Dedup.exact(d).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L)) // keeper 1 has 2 copies
  }

  test("minhash signatures identical for identical token streams") {
    val d = docsOf(1L -> "a b c d e f", 2L -> "a  B c D e f", 3L -> "f e d c b a")
    val rows = Dedup.signatures(d).collect().sortBy(_.getLong(0))
    assert(rows(0).toSeq.tail == rows(1).toSeq.tail)  // case/ws-insensitive equal
    assert(rows(0).toSeq.tail != rows(2).toSeq.tail)  // order-sensitive differ
  }

  test("LSH candidates find the planted near-duplicate") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val nearDup = base.replace("today", "tomorrow")
    val other = "completely different words appear in this document body here now ok fine"
    val d = docsOf(1L -> base, 2L -> nearDup, 3L -> other)
    val pairs = Dedup.jaccardPermille(Dedup.lshCandidates(d), d).collect()
    val planted = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(planted.isDefined, "near-dup pair (1,2) not found by LSH")
    assert(planted.get.getLong(2) > 600, "jaccard permille should be high")
    assert(!pairs.exists(r => r.getLong(1) == 3L && r.getLong(2) > 300))
  }

  test("nearDupClusters: copy-chain collapses to one component via star CC") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val edit1 = base.replace("today", "tomorrow")
    val edit2 = edit1.replace("quick", "speedy")   // chains 1-2-3
    val other = "completely different words appear in this document body here now ok fine"
    val d = docsOf(1L -> base, 2L -> edit1, 3L -> edit2, 4L -> other)
    val out = graft.dedup.Dedup.nearDupClusters(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.getOrElse(1L, -1L) == 1L && out.getOrElse(2L, -1L) == 1L,
      s"chain must share component 1: $out")
    assert(!out.contains(4L), "the unrelated doc joins no cluster")
  }

  test("simhash: near-identical docs have small hamming distance") {
    val d = docsOf(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota lambda",
      3L -> "one two three four five six seven eight nine ten")
    val hs = d.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L), hs(2L)) <= ham(hs(1L), hs(3L)))
  }

  test("char n-gram hashes overlap for shared substrings") {
    val d = docsOf(1L -> "abcdefghij", 2L -> "abcdefghij", 3L -> "zzzzzzzzzz")
    val rows = d.select(col("doc_id"),
      Dedup.charNgramHashes(col("text")).as("ng")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(rows(1L) == rows(2L))
    assert(rows(1L).intersect(rows(3L)).isEmpty)
  }

  test("langId picks marker-rich language, und when no markers") {
    val d = docsOf(
      1L -> "the cat and the dog of a house",
      2L -> "der hund und die katze ist das",
      3L -> "xyz qqq www")
    val out = d.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("fingerprint is ws-insensitive but order-sensitive") {
    val d = docsOf(1L -> "a b  c", 2L -> "a b c", 3L -> "c b a")
    val fp = TextAnalysis.fingerprints(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L) != fp(3L))
  }
  test("duplicate clusters: min-label propagation finds chain components") {
    import TestSpark.spark.implicits._
    // chain 1-2, 2-3 plus isolated pair 10-11: keepers {1,1,1} and {10,10}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val out = graft.dedup.Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("clusterWeights: each copy carries 1/n permille; keeper is min doc_id") {
    import TestSpark.spark.implicits._
    val docs = Seq(
      (1L, "same  TEXT here"), (2L, "same text HERE"), (3L, "same text here"),
      (7L, "unique"))
      .toDF("doc_id", "text")
    val out = graft.dedup.Dedup.clusterWeights(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getLong(3)))).toMap
    assert(out(1L) == ((3L, true, 333L)))
    assert(out(2L) == ((3L, false, 333L)))
    assert(out(3L) == ((3L, false, 333L)))
    assert(out(7L) == ((1L, true, 1000L)))
  }

  test("qualityKeeper: exactly one best per cluster, and it has the top logit") {
    import TestSpark.spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base), (2L, base.replace("today", "tomorrow")),
      (3L, base.replace("quick", "rapid")),
      (9L, "completely different words appear in this document body here now ok"))
      .toDF("doc_id", "text")
    val out = graft.dedup.Dedup.qualityKeeper(docs).collect()
    val ids = out.map(_.getLong(1)).toSet
    assert(ids.contains(1L) && ids.contains(2L) && !ids.contains(9L))
    val byCluster = out.groupBy(_.getLong(0))
    byCluster.foreach { case (_, rows) =>
      val best = rows.filter(_.getBoolean(3))
      assert(best.length == 1)
      assert(best.head.getLong(2) == rows.map(_.getLong(2)).max)
    }
  }

  test("sorted-neighborhood: the fwd pass catches a suffix edit, the rev " +
    "pass catches a prefix edit, jaccard verify drops sort-neighbors " +
    "that are not near-dups") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = docsOf(
      1L -> base,
      2L -> (base + " extra tail words"),      // fwd-adjacent to 1
      3L -> ("zzz prefix shift " + base),      // rev pass: shares NO fwd prefix
      4L -> "completely different content about ships and harbors at dawn",
      5L -> "yet another unrelated document mentioning mountains and snow")
    val cands = graft.dedup.SortedNeighborhood.candidates(d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))   // same 24-char fwd key, adjacent
    // rev keys of 1 and 3 share the reversed-suffix prefix ("niaga...")
    assert(cands.contains((1L, 3L)) || cands.contains((2L, 3L)))
    val verified = graft.dedup.SortedNeighborhood.similarPairs(d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.contains((1L, 2L)))
    assert(!verified.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!verified.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("sorted-neighborhood: candidate volume is linear — at most " +
    "passes x (window-1) x n pairs, even on identical keys") {
    // 40 identical docs: LSH would emit all C(40,2)=780 pairs; SNM emits
    // at most 2 x 3 x 40 = 240 (before the least/greatest distinct fold)
    val d = docsOf((1L to 40L).map(i => i -> "same text every time"): _*)
    val n = graft.dedup.SortedNeighborhood.candidates(d, windowSize = 4).count()
    assert(n <= 2L * 3L * 40L)
    assert(n >= 39L)   // the fwd chain alone pairs every adjacent doc
  }

  test("dupSizeHistogram: planted size strata and exact corpus mass shares") {
    val docs = Seq(
      (1L, "unique one"), (2L, "unique two"),           // 2 clusters of size 1
      (3L, "pair text"), (4L, "pair text"),             // 1 cluster of size 2
      (5L, "triple t"), (6L, "triple t"), (7L, "triple t")) // 1 of size 3
      .toDF("doc_id", "text")
    val out = graft.dedup.Dedup.dupSizeHistogram(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 2L, 285L)))   // 2*1000/7
    assert(out(2L) == ((1L, 2L, 285L)))
    assert(out(3L) == ((1L, 3L, 428L)))   // 3*1000/7
  }

  test("bbit screen: identical docs match on all bits; estimate formula exact") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content about distributed query engines here")
    ).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.bbitEstimates(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // identical pair is an LSH candidate; all 8 low bits agree
    val (m, est, exact) = out((1L, 2L))
    assert(m == 8L && est == 1000L && exact == 1000L)
    // the estimator is the fixed affine map of the match count everywhere
    out.values.foreach { case (mm, ee, _) =>
      assert(ee == math.max(0L, (2 * mm * 1000) / 8 - 1000))
    }
    // signatures pack into [0, 256): one byte of state per doc
    val sigs = graft.dedup.Dedup.bbitSignatures(docs).collect()
      .map(_.getLong(1))
    assert(sigs.forall(s => s >= 0L && s < 256L))
    assert(sigs(0) == sigs(1))
  }

  test("blockingRecall: identical pair counted and caught; sub-tau pairs excluded") {
    val base = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val docs = Seq(
      (11L, base), (22L, base),                          // identical: band 10
      (33L, "entirely unrelated content about spark physical plans and shuffles"),
      (44L, base + " with a couple extra words")          // high-band near-dup
    ).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.blockingRecall(docs, sampleMod = 11L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // identical pair lands in band 10 with recall 1000
    assert(out(10L)._1 >= 1L && out(10L)._2 == out(10L)._1 && out(10L)._3 == 1000L)
    // every reported band is at or above tau (500 -> band >= 5)
    assert(out.keySet.forall(_ >= 5L))
    // no band reports more caught than true
    out.values.foreach { case (t, c, _) => assert(c <= t) }
  }

  test("dupAttribution: origin = min-doc source; copies attributed per pair") {
    val docs = Seq(
      // cluster 1: origin A (doc 1), one copy in B (normalization folds case/ws)
      (1L, "hello world", "A", 11L),
      (2L, "Hello   WORLD", "B", 13L),
      // cluster 2: origin A (doc 3); one self-copy in A, one copy in C
      (3L, "x y", "A", 3L),
      (4L, "x  Y", "A", 4L),
      (5L, "x y", "C", 3L),
      // unique doc: contributes nothing
      (6L, "lonely", "B", 6L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val out = graft.dedup.Dedup.dupAttribution(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      ("A", "B") -> ((1L, 13L, 1L)),   // doc 2 copied from cluster-1 origin A
      ("A", "A") -> ((1L, 4L, 1L)),    // doc 4: within-source re-ingestion
      ("A", "C") -> ((1L, 3L, 1L))))   // doc 5 copied from cluster-2 origin A
  }

  test("lshSweep: cost and recall move monotonically across the r ladder") {
    import TestSpark.spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), (2L, base), (3L, base),          // identical triple
      (4L, base + " extra1 extra2 extra3"),        // ~727 permille vs base
      (5L, "completely different words one two three four five six"),
      (6L, "unrelated tokens here differ entirely from every other doc")
    ).toDF("doc_id", "text")
    val out = dedup.Dedup.lshSweep(docs, sampleMod = 1L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out.keySet == Set(1L, 2L, 4L, 8L))
    // truth: 3 identical pairs + 3 partial pairs, same for every config
    out.values.foreach { case (bands, _, nTruth, nCaught, rec, prec) =>
      assert(nTruth == 6L && nCaught >= 3L)   // identical pairs never miss
      assert(rec >= 500L && rec <= 1000L && prec <= 1000L)
    }
    assert(out(1L)._1 == 8L && out(8L)._1 == 1L)
    // stricter bands never ADD candidates or recall
    val byR = Seq(1L, 2L, 4L, 8L).map(out)
    assert(byR.map(_._2).sliding(2).forall { case Seq(a, b) => a >= b })
    assert(byR.map(_._5).sliding(2).forall { case Seq(a, b) => a >= b })
  }

  test("winnowStats: shared-run guarantee, density bound, short-doc arms") {
    import TestSpark.spark.implicits._
    val run = "alpha beta gamma delta epsilon zeta eta theta"  // 8 tokens
    val docs = Seq(
      (0L, s"one two $run"),          // shares the 8-token run with 1
      (1L, s"$run nine ten eleven"),
      (2L, "totally different words here without any overlap present"),
      (3L, "a b c d"),                // 2 grams < w=4: whole-array window
      (4L, "a b")                     // 0 grams
    ).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.winnowStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // a shared token run of >= w+2 tokens guarantees >= 1 shared winnowed
    // fingerprint on both sides (a full window fits inside the shared grams)
    assert(out(0L)._3 >= 1L && out(1L)._3 >= 1L)
    // unique doc shares nothing; 8 tokens => 6 grams
    assert(out(2L) == ((6L, out(2L)._2, 0L)))
    // density: never more fingerprints than grams, at least one per window
    out.filterKeys(_ <= 2L).values.foreach { case (ng, nf, _) =>
      assert(nf >= 1L && nf <= ng)
    }
    // short doc: single whole-array window => exactly 1 fingerprint
    assert(out(3L) == ((2L, 1L, 0L)))
    // sub-shingle doc: nothing selected
    assert(out(4L) == ((0L, 0L, 0L)))
  }

  test("homoglyphDups: Cyrillic lookalike collides folded, exact copies alone don't") {
    import TestSpark.spark.implicits._
    val docs = Seq(
      (0L, "hello world"),
      (1L, "hеllo world"),   // Cyrillic е — byte-different, folds equal
      (2L, "different text"),
      (3L, "hello world"),        // exact copy: same RAW key as 0
      (4L, "lone doc"), (5L, "lone doc")  // exact-dup pair, no variant
    ).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.homoglyphDups(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // only the {0,1,3} cluster has >= 2 RAW variants
    assert(out == Map(0L -> ((0L, 3L, 2L)), 1L -> ((0L, 3L, 2L)),
      3L -> ((0L, 3L, 2L))), s"got $out")
  }
}
