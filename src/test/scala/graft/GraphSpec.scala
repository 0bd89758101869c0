package graft

import org.apache.spark.sql.functions._
import graft.graph.Graphs
import graft.dedup.EditDedup

/** Hand-computable fixtures for the graph operators (q170/q171) and the
  * edit-distance blocked dedup (q169) — the oracle rows cover the synthetic
  * corpus; these pin the math on graphs small enough to verify by hand. */
class GraphSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("pageRank: 2-cycle splits mass evenly, bit-exact fixed point") {
    // a <-> b: symmetric graph, every iteration keeps r(a)=r(b)=S/2.
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val r = Graphs.pageRank(edges, iters = 3).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("a") == r("b"))
    // total mass stays within integer floor-div loss of S (each of the 3
    // steps can floor away at most a few units per term)
    assert(math.abs(r.values.sum - Graphs.RankScale) < 100L)
  }

  test("pageRank: dangling sink redistributes, hub outranks leaf") {
    // star: a->b, a->c, b->a; c is dangling (no out-edges).
    val edges = Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L))
      .toDF("src", "dst", "w")
    val r = Graphs.pageRank(edges, iters = 3).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.keySet == Set("a", "b", "c"))
    assert(r("a") > r("c")) // a receives b's whole rank; c only half of a's
    assert(math.abs(r.values.sum - Graphs.RankScale) < 100L)
  }

  test("triangleCounts: one triangle plus a pendant edge") {
    // triangle a-b-c, pendant c-d: each corner in exactly 1 triangle, d in 0.
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"))
      .toDF("u", "v")
    val out = Graphs.triangleCounts(edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("triangleCounts: K4 has 3 triangles per vertex, counted once each") {
    val vs = Seq("a", "b", "c", "d")
    val edges = (for { i <- vs.indices; j <- vs.indices if i < j }
      yield (vs(i), vs(j))).toDF("u", "v")
    val out = Graphs.triangleCounts(edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == vs.map(_ -> 3L).toMap) // C(3,2)=3 triangles through each
  }

  test("toolTransitionEdges: counts ordered transitions, drops self-loops") {
    val t = Seq(
      ("c1", 0, "grep"), ("c1", 1, "edit"), ("c1", 2, "edit"), ("c1", 3, "grep"),
      ("c2", 0, "grep"), ("c2", 1, "edit"))
      .toDF("conv_id", "turn_idx", "tool")
    val e = Graphs.toolTransitionEdges(t).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(e == Map(("grep", "edit") -> 2L, ("edit", "grep") -> 1L))
  }

  test("editPairs finds small-edit neighbor sharing prefix and band") {
    val base = "the quick brown fox jumps over the lazy dog " + ("x" * 40)
    val d = Seq(
      1L -> base,
      2L -> (base + "!"),            // dist 1, same prefix, adjacent band ok
      3L -> ("completely different prefix content here " + ("y" * 40)))
      .toDF("doc_id", "text")
    val pairs = EditDedup.editPairs(d).collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert(p.getLong(0) == 1L && p.getLong(1) == 2L && p.getLong(2) == 1L)
  }

  test("editPairs blocking: differing prefix hides a pair (documented trade)") {
    val a = "A" + ("z" * 60)
    val b = "B" + ("z" * 60) // dist 1 but first char differs → different block
    val d = Seq(1L -> a, 2L -> b).toDF("doc_id", "text")
    assert(EditDedup.editPairs(d).count() == 0L)
  }

  test("editPairs excludes exact duplicates (dist 0)") {
    val t = "same exact text in both documents " + ("q" * 30)
    val d = Seq(1L -> t, 2L -> t).toDF("doc_id", "text")
    assert(EditDedup.editPairs(d).count() == 0L)
  }

  test("LevBanded.dist matches the builtin 3-arg levenshtein pairwise") {
    import graft.dedup.LevBanded
    val pairs = Seq(
      ("kitten", "sitting"), ("", ""), ("", "abc"), ("abc", ""),
      ("same", "same"), ("café au lait", "cafe au lait"),
      ("αβγδε", "αβξδε"), ("a" * 50, "a" * 50 + "bbb"),
      ("the quick brown fox", "the quick brown cat"),
      ("x" * 30, "y" * 30), // distance 30 > k: both must say -1
      ("ab" * 20, "ba" * 20))
    val df = pairs.toDF("l", "r")
    for (k <- Seq(0, 1, 3, 20)) {
      val got = df.select(
        LevBanded.levBanded(col("l"), col("r"), k).as("mine"),
        levenshtein(col("l"), col("r"), k).as("builtin")).collect()
      got.zip(pairs).foreach { case (row, p) =>
        assert(row.getInt(0) == row.getInt(1), s"k=$k pair=$p")
      }
    }
  }

  test("editPairs hot-block guard drops oversized boilerplate cells") {
    // 70 docs sharing prefix and length band: the cell overflows the
    // default cap and produces nothing; a generous cap finds all pairs
    val base = "shared boilerplate prefix " + ("z" * 40) + " tail"
    val d = (1 to 70).map(i => i.toLong -> (base + ("%02d".format(i))))
      .toDF("doc_id", "text")
    assert(EditDedup.editPairs(d).count() == 0L)
    assert(EditDedup.editPairs(d, maxBlock = 10000).count() == 70L * 69 / 2)
  }

  test("labelPropagation: disjoint communities never share labels") {
    // two triangles with no bridge: labels stay inside each component
    val edges = Seq(
      ("a", "b", 5L), ("b", "c", 5L), ("c", "a", 5L),
      ("x", "y", 5L), ("y", "z", 5L), ("z", "x", 5L))
      .toDF("src", "dst", "w")
    val out = Graphs.labelPropagation(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val t1 = Set("a", "b", "c"); val t2 = Set("x", "y", "z")
    assert(t1.forall(v => t1.contains(out(v))))
    assert(t2.forall(v => t2.contains(out(v))))
    // deterministic: a second run produces the identical assignment
    val out2 = Graphs.labelPropagation(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == out2)
  }

  test("bfsDistances: chain from the smallest vertex, 4-hop horizon") {
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L),
      ("d", "e", 1L), ("e", "f", 1L)).toDF("src", "dst", "w")
    val out = Graphs.bfsDistances(edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // f is 5 hops out — beyond the 4 unrolled rounds, so absent
    assert(out == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L, "e" -> 4L))
  }

  test("kCore: 2-core keeps the triangle, peels the pendant chain") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("u", "v")
    val out = Graphs.kCore(edges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // e peels first (deg 1), then d; the triangle survives at degree 2
    assert(out == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }

  test("linkPredict: square diagonal scores two common neighbors") {
    // cycle a-b-c-d-a: diagonals (a,c) and (b,d) each have two common
    // neighbors of degree 2 → common_n 2, ra_score 2·(1e6/2)
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"))
      .toDF("u", "v")
    val out = Graphs.linkPredict(edges).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out == Map(
      ("a", "c") -> (2L, 1000000L), ("b", "d") -> (2L, 1000000L)))
  }

  test("linkPredict: adjacent pairs are excluded even with common neighbors") {
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("u", "v")
    assert(Graphs.linkPredict(edges).count() == 0L) // triangle: all adjacent
  }

  test("communityStats: internal vs external mass, bridge counted twice") {
    val edges = Seq(("a", "b", 2L), ("b", "c", 3L), ("x", "y", 4L),
      ("c", "x", 7L)).toDF("src", "dst", "w")
    val labels = Seq(("a", "A"), ("b", "A"), ("c", "A"), ("x", "X"),
      ("y", "X")).toDF("v", "lbl")
    val out = Graphs.communityStats(edges, labels).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == Map("A" -> ((3L, 5L, 7L)), "X" -> ((2L, 4L, 7L))))
  }

  test("neighborhoodFeatures: path graph degrees and 2-hop reach") {
    val edges = Seq(("a", "b"), ("b", "c")).toDF("u", "v")
    val out = Graphs.neighborhoodFeatures(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == Map(
      "a" -> ((1L, 2L, 2L)),  // deg 1, neighbor b has deg 2, reaches {b,c}
      "b" -> ((2L, 2L, 2L)),  // two deg-1 neighbors, reaches {a,c}
      "c" -> ((1L, 2L, 2L))))
  }

  test("toolCoUsage: distinct-conversation weighting, within-conv dedup") {
    val t = Seq(
      ("c1", 0, "t1"), ("c1", 1, "t2"), ("c1", 2, "t1"), // t1 twice, once
      ("c2", 0, "t1"), ("c2", 1, "t2"), ("c2", 2, "t3"),
      ("c3", 0, "t1"), ("c3", 1, ""))
      .toDF("conv_id", "turn_idx", "tool")
    val out = Graphs.toolCoUsage(t).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("t1", "t2") -> 2L, ("t1", "t3") -> 1L,
      ("t2", "t3") -> 1L))
  }

  test("connectedComponentsStar: 64-chain collapses to its min in " +
    "logarithmic rounds; disjoint chains stay apart") {
    import TestSpark.spark.implicits._
    // a 64-long chain (diameter 63 — min-label propagation would need 63
    // rounds), a short chain, and a 2-node component
    val edges = ((0L until 63L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (200L, 201L))).toDF("a", "b")
    val out = Graphs.connectedComponentsStar(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 63L).forall(out(_) == 0L), s"chain collapses to 0: $out")
    assert((100L to 102L).forall(out(_) == 100L))
    assert(out(200L) == 200L && out(201L) == 200L)
    assert(out.size == 64 + 3 + 2)
  }

  test("hubRemovalRobustness: star-bridged clusters shatter when the " +
    "bridge hubs leave") {
    // two triangles bridged through hub h (degree 4, strictly the max);
    // removing it splits one 9-vertex component into two triangles,
    // isolating the pendants x and y
    val edges = (Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("d", "e"), ("e", "f"), ("d", "f"),
      ("a", "h"), ("d", "h"), ("h", "x"), ("h", "y"))).toDF("u", "v")
    val out = Graphs.hubRemovalRobustness(edges, topK = 1).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out("full") == ((9L, 1L, 9L)))
    assert(out("hubs_removed") == ((6L, 2L, 3L)))
  }

  test("hits: dispatcher is the hub, targets are authorities; weighted " +
    "hand trajectory") {
    // root fans out to two leaves: pure hub vs pure authorities, fixpoint
    val fan = Seq(("r", "x", 1L), ("r", "y", 1L)).toDF("src", "dst", "w")
    val out1 = Graphs.hits(fan).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out1 == Map("r" -> ((1000L, 0L)),
      "x" -> ((0L, 1000L)), "y" -> ((0L, 1000L))))
    // weighted 3-vertex: a→c (w3), b→c (w1), c→b (w1); round-by-round
    // hand trajectory → hubs (1000, 333, 8), auths (0, 24, 1000)
    val g = Seq(("a", "c", 3L), ("b", "c", 1L), ("c", "b", 1L))
      .toDF("src", "dst", "w")
    val out2 = Graphs.hits(g).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out2 == Map("a" -> ((1000L, 0L)), "b" -> ((333L, 24L)),
      "c" -> ((8L, 1000L))))
  }

  test("degreeAssortativity: star is -1000, regular graph degenerate, " +
    "triangle+pendant hand value") {
    def run(es: Seq[(String, String)]) = {
      val r = Graphs.degreeAssortativity(es.toDF("u", "v")).collect()(0)
      (r.getLong(0), r.getBoolean(1), r.getLong(2))
    }
    // star: hub deg 3 ↔ leaves deg 1 — perfectly disassortative
    assert(run(Seq(("h", "a"), ("h", "b"), ("h", "c"))) == ((3L, false, -1000L)))
    // disjoint edges: every degree 1 → zero variance → degenerate
    assert(run(Seq(("a", "b"), ("c", "d"))) == ((2L, true, 0L)))
    // triangle abc + pendant cd: M=8, Σjk=38, Σj=18, Σj²=44 →
    // r = (8·38−324)/(8·44−324) = −20/28 → −⌊20000/28⌋ = −714
    assert(run(Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")))
      == ((4L, false, -714L)))
  }
}
