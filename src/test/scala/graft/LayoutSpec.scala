package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout (q150): interleave correctness against an independent
  * Scala reference, the per-file bound invariants the skip verdicts rest
  * on, and verdict soundness (a skipped file really contains no match). */
class LayoutSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  /** Independent bit-interleave reference. */
  private def zRef(a: Long, b: Long): Long =
    (0 until Layout.DimBits).map { i =>
      (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
    }.sum

  test("zValue matches the reference interleave across the dim range") {
    val samples = Seq((0L, 0L), (1023L, 1023L), (1L, 0L), (0L, 1L),
      (512L, 256L), (341L, 682L), (1000L, 23L), (77L, 900L))
    val out = samples.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b")).as("z"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(2) == zRef(r.getLong(0), r.getLong(1)),
        s"interleave mismatch at (${r.getLong(0)}, ${r.getLong(1)})")
    }
    // bijectivity on the sample: distinct inputs → distinct z
    assert(out.map(_.getLong(2)).distinct.length == samples.length)
  }

  test("layoutStats: z-prefix files carry tight bounds, linear files do " +
    "not, and skip verdicts are sound") {
    val langs = Seq("en", "es", "de", "fr", "zh")
    val sources = (0 until 20).map(i => s"src$i")
    val docs = (0L until 400L).map(i =>
      (i, s"text $i", langs((i % 5).toInt), sources((i % 20).toInt)))
      .toDF("doc_id", "text", "lang", "source")
    val stats = Layout.layoutStats(docs).collect()
    val (zrows, lrows) = stats.partition(_.getString(0) == "zorder")
    assert(zrows.nonEmpty && lrows.nonEmpty)
    // both layouts partition the corpus: row counts sum to |docs| each
    assert(zrows.map(_.getLong(2)).sum == 400L)
    assert(lrows.map(_.getLong(2)).sum == 400L)
    // z-prefix files pin ha to 3 top bits and hb to 2 → bounded widths
    zrows.foreach { r =>
      assert(r.getLong(4) - r.getLong(3) <= 127L, "ha width exceeds z prefix")
      assert(r.getLong(6) - r.getLong(5) <= 255L, "hb width exceeds z prefix")
    }
    // soundness: recompute each doc's file; no 'en' doc may live in a
    // file whose zorder row claims skip_lang (same for src7 / skip_source)
    val assigned = docs.select(
      col("lang"), col("source"),
      shiftright(Layout.zValue(Layout.dimHash(col("lang")),
        Layout.dimHash(col("source"))), 15).as("file_id")).collect()
    val skipLang = zrows.filter(_.getBoolean(7)).map(_.getLong(1)).toSet
    val skipSrc = zrows.filter(_.getBoolean(8)).map(_.getLong(1)).toSet
    assigned.foreach { r =>
      if (r.getString(0) == "en")
        assert(!skipLang.contains(r.getLong(2)), "skipped file holds an 'en' doc")
      if (r.getString(1) == "src7")
        assert(!skipSrc.contains(r.getLong(2)), "skipped file holds a src7 doc")
    }
    // the layout earns its keep: z-order skips strictly more files for the
    // lang predicate than linear (which interleaves all langs everywhere)
    val linSkipLang = lrows.count(_.getBoolean(7))
    assert(skipLang.size > linSkipLang,
      s"zorder skip_lang=${skipLang.size} not better than linear=$linSkipLang")
  }

  test("partitionSkewStats: totals conserved, only the hot key's " +
    "partition flags hot") {
    val rows = (1 to 80).map(i => ("hot", i.toLong)) ++
      (1 to 20).map(i => (s"k$i", i.toLong))
    val df = rows.toDF("conv_id", "turn_idx")
    val out = Layout.partitionSkewStats(df, "conv_id", nParts = 4).collect()
    assert(out.map(_.getLong(1)).sum == 100L)           // rows conserved
    assert(out.map(_.getLong(2)).sum == 21L)            // distinct keys
    val hotPart = TestSpark.spark.range(1)
      .select((conv(substring(md5(lit("hot")), 1, 8), 16, 10)
        .cast("long") % 4).as("p")).collect()(0).getLong(0)
    out.foreach { r =>
      val isHotPart = r.getLong(0) == hotPart
      assert(r.getBoolean(4) == isHotPart,
        s"partition ${r.getLong(0)} hot=${r.getBoolean(4)}")
      if (isHotPart) assert(r.getLong(3) >= 800L)       // ≥80% share
    }
  }

  test("zoneMapAudit: time clustering skips, ingestion hashing cannot") {
    // 1000 seconds of data, 10 conversations interleaved across all time:
    // hash shards each span the full range (no skipping); time-range
    // shards confine the mid-decile query to ~11% of shards
    val turns = (0 until 1000).map(i => (s"c${i % 10}", i.toLong))
      .toDF("conv_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val out = Layout.zoneMapAudit(turns).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val (inS, inH, inRows, inScan, inSkip, inScanPm) = out("ingest_hash")
    val (trS, trH, trRows, trScan, trSkip, trScanPm) = out("time_range")
    assert(inRows == 1000L && trRows == 1000L)
    // every hash shard spans the whole timeline: nothing skippable
    assert(inH == inS && inSkip == 0L && inScanPm == 1000L)
    // time-clustered: only the window's shards read (~10% + boundary)
    assert(trSkip >= 800L && trScanPm <= 200L && trH < trS)
  }

  test("rehashAudit: HRW moves ~1/(n+1) of keys, mod reshuffles nearly all") {
    val df = (0 until 500).map(i => s"conv-$i").toDF("conv_id")
    val P = 1000000007L
    def hash(s: String) = s.foldLeft(7L)((a, c) => (a * 31 + c.toLong) % P)
    def hrw(h: Long, n: Int) = (0 until n)
      .map(s => ((h * (2L * s + 3) + 7L * s) % P, s.toLong)).max._2
    val keys = (0 until 500).map(i => hash(s"conv-$i"))
    val expMod = keys.count(h => h % 16 != h % 17).toLong
    val expHrw = keys.count(h => hrw(h, 16) != hrw(h, 17)).toLong
    val out = operators.Layout.rehashAudit(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("mod") == ((500L, expMod, expMod * 1000 / 500)))
    assert(out("hrw") == ((500L, expHrw, expHrw * 1000 / 500)))
    // the consistent-hashing contrast the audit exists to show
    assert(out("hrw")._3 < 150L && out("mod")._3 > 800L,
      s"hrw ${out("hrw")._3}‰ vs mod ${out("mod")._3}‰")
  }

  test("encodingAudit: runs/dict/cost model from a hand-ordered file") {
    val df = Seq(
      ("f1", "c1", 1L, "r", "t"), ("f1", "c1", 2L, "r", "t"),
      ("f1", "c1", 3L, "r", "t"), ("f1", "c1", 4L, "u", "t"),
      ("f1", "c1", 5L, "u", "t"), ("f1", "c1", 6L, "r", "t")
    ).toDF("src_file", "conv_id", "turn_idx", "role", "tool")
    val out = operators.Layout.encodingAudit(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getString(8)))).toMap
    // role r,r,r,u,u,r: 3 runs, dict 2 → plain 30, dict 2·1+⌈6/8⌉=3,
    // rle 3+12=15 → dict wins under the model
    assert(out(("f1", "role")) == ((6L, 2L, 3L, 30L, 3L, 15L, "dict")))
    // constant tool: 1 run, dict 1 (0 index bits) → dict 1, rle 5
    assert(out(("f1", "tool")) == ((6L, 1L, 1L, 30L, 1L, 5L, "dict")))
  }

  test("rebalancePlan: interval alignment reproduces the greedy move " +
    "list, total moved = sum of surpluses, quotas restored") {
    // sizes a=10 b=6 c=2 d=2 → quota 5 each; excess +5 +1 −3 −3 →
    // moves a→c 3, a→d 2, b→d 1
    val df = ((1 to 10).map(i => ("a", i)) ++ (1 to 6).map(i => ("b", i)) ++
      (1 to 2).map(i => ("c", i)) ++ (1 to 2).map(i => ("d", i)))
      .toDF("src_file", "x")
    val out = operators.Layout.rebalancePlan(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("a", "c") -> 3L, ("a", "d") -> 2L, ("b", "d") -> 1L))
    // remainder quotas: total 21 over 4 groups → quotas 6,5,5,5 (lex)
    val df2 = df.unionByName(Seq(("a", 99)).toDF("src_file", "x"))
    val out2 = operators.Layout.rebalancePlan(df2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out2.values.sum == 6L, s"a keeps its remainder slot: $out2")
  }
}
