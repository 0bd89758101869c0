package graft

import org.apache.spark.sql.functions._
import graft.ann.Similarity

/** Edge fixtures for the exact-clone-collapse reconstruction paths
  * (round-4 introduced the collapse; these pin its boundary logic
  * directly instead of leaving it to the sf0.01 oracle corpus):
  *
  *  - equal-cosine candidate groups straddling the k+1 cut in
  *    [[Similarity.cellTopK]]
  *  - query group == candidate group (self-exclusion inside one group)
  *  - self-similar vs non-self-similar (NaN-cosine zero vector) groups
  *    in [[Similarity.semanticDedup]]
  *  - gapped / interleaved member ids across groups
  *  - a degenerate clone group (1M exact copies of one vector) that the
  *    round-4 collect_list member arrays would have materialized as one
  *    giant row — must run row-shaped and return the exact verdict
  *
  * Each case asserts equality against an UNCOLLAPSED reference computed
  * in plain Scala over the same input (same double math: sequential
  * list-order dot products, floor-permille comparisons).
  */
class CloneCollapseSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
  private def cos(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  private def cosPm(a: Array[Float], b: Array[Float]): Long =
    math.floor(cos(a, b) * 1000.0).toLong

  test("cellTopK: equal-cosine groups at the k+1 cut, query group == " +
    "candidate group, gapped ids — equals the uncollapsed per-query scan") {
    // one cell; eQ's group holds the query (0) AND a non-query member (7);
    // eA and eB are DIFFERENT embeddings with the SAME cosine to eQ
    // (1/√2 via permutation symmetry) so the k+1 boundary cuts through an
    // equal-cosine level spanning two groups; eC pads the cell; group D is
    // a second query group (id 100) orthogonal to everything
    val eQ = Array(1f, 1f, 0f, 0f)
    val eA = Array(1f, 0f, 0f, 0f)
    val eB = Array(0f, 1f, 0f, 0f)
    val eC = Array(0f, 0f, 1f, 0f)
    val eD = Array(0f, 0f, 0f, 1f)
    val members: Seq[(Long, Array[Float])] = Seq(
      0L -> eQ, 7L -> eQ,
      2L -> eA, 3L -> eA,
      1L -> eB,
      4L -> eC, 5L -> eC, 6L -> eC,
      100L -> eD)
    val assigned = members.map { case (id, e) => (0L, e, id) }
      .toDF("cent_id", "embedding", "vec_id")
    for (k <- Seq(1, 2, 3, 4)) {
      val out = Similarity.cellTopK(assigned, k = k, queryMod = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // uncollapsed reference: per query, rank ALL other cell members
      val expected = members.filter(_._1 % 100 == 0).flatMap { case (q, qe) =>
        members.filter(_._1 != q)
          .map { case (id, e) => (id, cos(qe, e)) }
          .sortBy { case (id, c) => (-c, id) }
          .take(k).zipWithIndex
          .map { case ((id, _), i) => (q, id, i + 1) }
      }.toSet
      assert(out == expected, s"k=$k: got $out, want $expected")
    }
  }

  test("cellTopK: an all-clone cell collapses to one group per side and " +
    "still excludes only the query itself") {
    // every vector identical: each query's top-k = the k smallest OTHER ids
    val e = Array(1f, 2f, 0f, 0f)
    val assigned = Seq(0L, 3L, 50L, 51L, 52L, 100L)
      .map(id => (0L, e, id)).toDF("cent_id", "embedding", "vec_id")
    val out = Similarity.cellTopK(assigned, k = 3, queryMod = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = Set(
      (0L, 3L, 1), (0L, 50L, 2), (0L, 51L, 3),
      (50L, 0L, 1), (50L, 3L, 2), (50L, 51L, 3),
      (100L, 0L, 1), (100L, 3L, 2), (100L, 50L, 3))
    assert(out == expected)
  }

  test("semanticDedup: self-similar clones, NaN-cosine zero-vector group, " +
    "interleaved ids across near-dup groups — equals the uncollapsed probe") {
    val base = Array.tabulate(4)(j => 1.0f + j * 0.01f)
    val zero = Array(0f, 0f, 0f, 0f)
    val vecs: Seq[(Long, Array[Float])] = Seq(
      // group Y: self-similar clones with gapped ids
      5L -> base, 8L -> base, 9L -> base,
      // group X: scaled copy (cos 1.0 to Y), ids interleaved below Y's
      1L -> base.map(_ * 2.0f), 4L -> base.map(_ * 2.0f),
      // zero vectors: cos(0,0) = NaN → NOT self-similar, never dominated
      2L -> zero, 6L -> zero,
      // far-away vector, alone
      20L -> Array(1f, -1f, 1f, -1f))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(df, thresholdPermille = 450, dim = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3)))).toMap

    // uncollapsed reference: candidate pairs are hamming<=1 LSH buckets
    // (identical embeddings always share a bucket); b is dominated by
    // every candidate a < b above the threshold
    def bucket(v: Array[Float]): Long =
      (0 until Similarity.NumPlanes).map { i =>
        val p = Similarity.planeComponents(i, 4)
        if (v.zip(p).map { case (x, c) => x.toDouble * c }.sum > 0) 1L << i
        else 0L
      }.sum
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val expected = vecs.map { case (b, bv) =>
      // NaN cosine (zero vectors) floors to NaN; NaN.toLong = 0 < 450, the
      // same below-threshold verdict Spark's NaN→null cast produces
      val doms = vecs.filter { case (a, av) =>
        a < b && ham(bucket(av), bucket(bv)) <= 1 && cosPm(av, bv) >= 450
      }.map(_._1)
      b -> ((doms.size.toLong, doms.sorted.headOption, doms.isEmpty))
    }.toMap
    assert(out == expected, s"got $out, want $expected")
    // the hand-checkable core rows
    assert(out(5L) == ((2L, Some(1L), false))) // dominated by X's 1 and 4
    assert(out(1L) == ((0L, None, true)))
    assert(out(4L) == ((1L, Some(1L), false)))
    assert(out(2L) == ((0L, None, true)))      // zero vector: NaN cosine
    assert(out(6L) == ((0L, None, true)))      // zero clone: NOT dominated
    assert(out(8L) == ((3L, Some(1L), false)))
  }

  test("nearDupPairsCollapsed equals the plain probe on a clone-heavy " +
    "corpus (cross-group, within-group, and below-threshold legs)") {
    // clone groups of size 3/2/1 plus a zero-vector pair (NaN self-cos →
    // no within pairs) and a far vector; compare both forms pairwise
    val base = Array.tabulate(4)(j => 1.0f + j * 0.01f)
    val vecs = Seq(
      5L -> base, 8L -> base, 9L -> base,
      1L -> base.map(_ * 2.0f), 4L -> base.map(_ * 2.0f),
      2L -> Array(0f, 0f, 0f, 0f), 6L -> Array(0f, 0f, 0f, 0f),
      20L -> Array(1f, -1f, 1f, -1f))
      .toDF("vec_id", "embedding")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = key(Similarity.nearDupPairs(vecs, 450, dim = 4))
    val coll = key(Similarity.nearDupPairsCollapsed(vecs, 450, dim = 4))
    assert(plain.nonEmpty && coll == plain, s"collapsed $coll != plain $plain")
  }

  test("degenerate clone group: 1M exact copies run row-shaped end-to-end " +
    "(semanticDedup + ivfTopK) with the exact verdict") {
    val n = 1000000L
    // 1M clones of e0 + one near-dup group above them + one far vector
    val clones = spark.range(0, n).select(col("id").as("vec_id"),
      array(lit(1f), lit(1f), lit(0.5f), lit(0f)).as("embedding"))
    val extras = Seq(
      (n + 1L, Array(2f, 2f, 1f, 0f)),      // exact scaled dup (cos 1.0)
      (n + 2L, Array(-1f, 1f, -0.5f, 1f)))  // far away
      .toDF("vec_id", "embedding")
    val vecs = clones.unionByName(extras)

    val sd = Similarity.semanticDedup(vecs, thresholdPermille = 450, dim = 4)
    val agg = sd.agg(
      count(lit(1)).as("n"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
      max(col("n_dominating")).as("max_dom")).collect()(0)
    assert(agg.getLong(0) == n + 2)
    // kept: clone id 0 and the far vector; everything else dominated
    assert(agg.getLong(1) == 2L)
    // the scaled dup at n+1 is dominated by all 1M clones
    assert(agg.getLong(2) == n)
    val lastClone = sd.filter(col("vec_id") === (n - 1)).collect()(0)
    assert(lastClone.getLong(1) == n - 1 && lastClone.getLong(2) == 0L)

    // ivfTopK: queryMod above n → exactly one query (vec_id 0) inside the
    // 1M-member clone group; its top-k = the k+1 smallest ids minus itself
    val topk = ann.Similarity.ivfTopK(vecs, k = 5, queryMod = 2000003,
      centroidMod = 1500000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._3)
    assert(topk.map(t => (t._1, t._2)).toSeq ==
      Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L)))
  }
}
