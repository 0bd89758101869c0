package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-governance operators a production corpus must support: deletion
  * propagation (right-to-be-forgotten over a deduplicated corpus) and
  * snapshot diffing between dataset versions. Both are audit surfaces —
  * the output is evidence, not just the mutation.
  */
object Governance {

  /** Dedup-aware deletion propagation: a deletion request names specific
    * documents, but a web-scale corpus carries COPIES of the same content
    * under other ids — honoring the request means deleting every document
    * that shares the requested content, not just the named rows.
    *
    * The request list here is the deterministic `doc_id % reqMod == 0`
    * stratum (production supplies the real list; the dataflow is the
    * contract). Per doc: whether it was named, whether it is deleted, and
    * why (`direct` = named, `copy` = same content as a named doc).
    *
    * Scale shape: requests are a sliver of the corpus, so their DISTINCT
    * md5 content keys broadcast; the corpus probes that set map-side off
    * the scan — no corpus-wide shuffle, no self-join. The 32-char key is
    * what moves, never the text. */
  def deletePropagation(docs: DataFrame, reqMod: Int = 23): DataFrame = {
    val keyed = docs.select(col("doc_id"), col("source"),
      (col("doc_id") % reqMod === 0).as("requested"),
      md5(col("text")).as("ckey"))
    val delKeys = keyed.filter(col("requested"))
      .select(col("ckey").as("dkey")).distinct()
    keyed.join(broadcast(delKeys), col("ckey") === col("dkey"), "left")
      .select(col("doc_id"), col("source"), col("requested"),
        col("dkey").isNotNull.as("deleted"),
        when(col("requested"), "direct")
          .when(col("dkey").isNotNull, "copy").as("reason"))
  }

  /** Snapshot diff between two corpus versions: per key, whether the doc
    * was added, removed, changed (content hash differs), or unchanged —
    * the audit step between iterative corpus builds (what did this
    * pipeline change, and how much re-training data does it invalidate?).
    *
    * Scale shape: one full-outer equi-join on the key over (key, 32-char
    * md5) projections — the payload never moves. At 100 TB both snapshots
    * are bucketed by key on disk, making this join shuffle-free; here it
    * is the plain sort-merge the optimizer picks. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame,
                   key: String = "doc_id"): DataFrame = {
    val a = v1.select(col(key), md5(col("text")).as("h1"))
    val b = v2.select(col(key), md5(col("text")).as("h2"))
    a.join(b, Seq(key), "full_outer")
      .select(col(key),
        when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") =!= col("h2"), "changed")
          .otherwise("same").as("status"))
  }

  /** k-anonymity audit over quasi-identifier cells — the re-identification
    * check a corpus with per-document metadata owes its subjects: any
    * combination of quasi-identifiers (here language × source × a coarse
    * length bucket — the released metadata columns) shared by fewer than
    * `k` documents singles those documents out, even with every direct
    * identifier scrubbed. The output is the audit evidence: every cell
    * with its population and risk flag, so "generalize the length bucket"
    * or "suppress the cell" decisions are one filter away.
    *
    * One corpus-sized hash-agg to the quasi-identifier grid (map-side
    * combine; the grid is |langs|×|sources|×|buckets|, tiny at any corpus
    * size); the risk flag is a per-row expression on the aggregate. */
  def kAnonymity(docs: DataFrame, k: Long = 5L,
                 lenBucketWidth: Long = 100L): DataFrame =
    docs.select(col("lang"), col("source"),
        expr(s"n_chars DIV ${lenBucketWidth}L").as("len_bucket"))
      .groupBy("lang", "source", "len_bucket")
      .agg(count(lit(1)).as("cell_k"))
      .withColumn("at_risk", col("cell_k") < k)

  /** l-DIVERSITY audit — the homogeneity-attack complement of
    * [[kAnonymity]]: a cell can hold k rows and still leak when they all
    * share one SENSITIVE value (here `source`): "everyone in this
    * quasi-identifier cell came from crawl X" is itself a disclosure
    * k-anonymity cannot see. Per (lang, length-bucket) QI cell — the
    * sensitive attribute deliberately OUT of the cell key — report the
    * row count, the number of distinct sensitive values, the dominant
    * value's share ‰ (the practical attack odds), and the verdict
    * `diverse` = n_sensitive ≥ l.
    *
    * Shape: one (QI, sensitive) hash-agg off the scan, then a QI rollup
    * ON that grid (sum/count/max) — two aggregations, the second over an
    * aggregate; integer share arithmetic. */
  def lDiversity(docs: DataFrame, l: Int = 3,
                 lenBucketWidth: Long = 100L): DataFrame = {
    val cells = docs.select(col("lang"),
        expr(s"n_chars DIV ${lenBucketWidth}L").as("len_bucket"),
        col("source"))
      .groupBy("lang", "len_bucket", "source")
      .agg(count(lit(1)).as("n_sv"))
    cells.groupBy("lang", "len_bucket").agg(
        sum("n_sv").as("cell_n"),
        count(lit(1)).as("n_sensitive"),
        max("n_sv").as("top_n"))
      .withColumn("top_share_permille", expr("top_n * 1000 DIV cell_n"))
      .withColumn("diverse", col("n_sensitive") >= l)
      .select("lang", "len_bucket", "cell_n", "n_sensitive",
        "top_share_permille", "diverse")
  }

  /** MERKLE-style hierarchical snapshot diff — change LOCALIZATION at log
    * cost, where [[snapshotDiff]] pays a full-corpus join per comparison:
    * per-doc content hashes fold (order-independent bit_xor + count) into
    * id-range buckets at two granularities; comparing the bucket digests
    * names exactly which id ranges changed, so the row-level diff then
    * runs ONLY inside changed fine buckets (at 100 TB: compare ~4k coarse
    * digests daily, drill into the handful that moved — the full join
    * never happens on a quiet day). Every changed fine bucket's coarse
    * parent is changed by construction — the drill-down invariant.
    * xor digests miss only a changed PAIR with identical hash deltas
    * (2⁻⁶⁰-grade); the row counts catch all add/delete imbalances.
    *
    * Output: the changed buckets at both levels with per-side doc counts
    * (absent side = 0). One hash-agg per side per level, all on
    * (doc_id, 60-bit hash) projections — text never shuffles. */
  def merkleDiff(v1: DataFrame, v2: DataFrame, fineWidth: Long = 16L,
                 coarseWidth: Long = 256L): DataFrame = {
    def leaves(v: DataFrame) = v.select(col("doc_id"),
      conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("h"))
    def level(l: DataFrame, width: Long, name: String) =
      l.groupBy(expr(s"doc_id DIV $width").as("bucket"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("hx"))
        .select(lit(name).as("level"), col("bucket"), col("n"), col("hx"))
    def digests(v: DataFrame) = {
      val l = leaves(v)
      level(l, fineWidth, "fine").unionByName(level(l, coarseWidth, "coarse"))
    }
    val a = digests(v1).select(col("level"), col("bucket"),
      col("n").as("n_a"), col("hx").as("hx_a"))
    val b = digests(v2).select(col("level"), col("bucket"),
      col("n").as("n_b"), col("hx").as("hx_b"))
    a.join(b, Seq("level", "bucket"), "full_outer")
      .filter(coalesce(col("n_a"), lit(0L)) =!= coalesce(col("n_b"), lit(0L))
        || coalesce(col("hx_a"), lit(0L)) =!= coalesce(col("hx_b"), lit(0L)))
      .select(col("level"), col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
  }

  /** k-anonymity GENERALIZATION (local recoding) — the fix for what
    * [[kAnonymity]] audits: each document's length quasi-identifier is
    * released at the FINEST rung of a doubling bucket ladder
    * (base, 2·base, 4·base, 8·base, then "length dropped entirely")
    * whose cell still holds ≥ k documents; rows whose lang×source cell is
    * itself below k are suppressed outright. Doubling buckets NEST
    * (b/2 rolls 100-buckets into 200-buckets exactly), so every ladder
    * level's census derives from ONE finest-grain aggregate — no second
    * corpus pass per rung, and the release is deterministic (no
    * data-order-dependent splits as in Mondrian partitioning).
    *
    * Output per doc: the released rung (`gen_label`), the released bucket
    * lower bound (null once length is dropped/suppressed), and the cell
    * population backing the release (null when suppressed).
    *
    * Scale shape: one corpus hash-agg to the finest grid; the roll-ups
    * and the per-rung census live on that aggregate (≤ |langs|×|sources|×
    * buckets rows); the rung choice joins the grids back broadcast. */
  def kAnonGeneralize(docs: DataFrame, k: Long = 5L,
                      baseWidth: Long = 100L): DataFrame = {
    val base = docs.select(col("doc_id"), col("lang"), col("source"),
      expr(s"n_chars DIV $baseWidth").as("b0"))
    val g0 = base.groupBy("lang", "source", "b0")
      .agg(count(lit(1)).as("k0"))
    val g1 = g0.groupBy(col("lang"), col("source"),
        expr("b0 DIV 2").as("b1")).agg(sum("k0").as("k1"))
    val g2 = g1.groupBy(col("lang"), col("source"),
        expr("b1 DIV 2").as("b2")).agg(sum("k1").as("k2"))
    val g3 = g2.groupBy(col("lang"), col("source"),
        expr("b2 DIV 2").as("b3")).agg(sum("k2").as("k3"))
    val gAll = g3.groupBy("lang", "source").agg(sum("k3").as("k_all"))
    val joined = base
      .join(broadcast(g0), Seq("lang", "source", "b0"))
      .withColumn("b1", expr("b0 DIV 2"))
      .join(broadcast(g1), Seq("lang", "source", "b1"))
      .withColumn("b2", expr("b1 DIV 2"))
      .join(broadcast(g2), Seq("lang", "source", "b2"))
      .withColumn("b3", expr("b2 DIV 2"))
      .join(broadcast(g3), Seq("lang", "source", "b3"))
      .join(broadcast(gAll), Seq("lang", "source"))
    joined.select(col("doc_id"), col("lang"), col("source"),
      when(col("k0") >= k, s"w$baseWidth")
        .when(col("k1") >= k, s"w${baseWidth * 2}")
        .when(col("k2") >= k, s"w${baseWidth * 4}")
        .when(col("k3") >= k, s"w${baseWidth * 8}")
        .when(col("k_all") >= k, "len_dropped")
        .otherwise("suppressed").as("gen_label"),
      when(col("k0") >= k, col("b0") * baseWidth)
        .when(col("k1") >= k, col("b1") * baseWidth * 2)
        .when(col("k2") >= k, col("b2") * baseWidth * 4)
        .when(col("k3") >= k, col("b3") * baseWidth * 8)
        .as("bucket_lo"),
      when(col("k0") >= k, col("k0"))
        .when(col("k1") >= k, col("k1"))
        .when(col("k2") >= k, col("k2"))
        .when(col("k3") >= k, col("k3"))
        .when(col("k_all") >= k, col("k_all"))
        .as("cell_k"))
  }

  /** Principal PSEUDONYMIZATION audit — the privacy-preserving join key:
    * every login principal maps to a stable salted-hash pseudonym, so
    * downstream analytics join and aggregate per "user" without ever
    * carrying the identifier; the audit row per pseudonym carries its
    * event/conversation volume and a rare-activity flag (a pseudonym
    * with 2 events is re-identifiable the moment any quasi-identifier
    * attaches — the k-anonymity concern at the actor level).
    *
    * The identifier appears in NO output column. Deterministic given the
    * salt: re-runs and both engines produce identical pseudonyms. One
    * hash-agg keyed on the 12-hex pseudonym; map-side combinable. */
  def pseudonymize(parsed: DataFrame, salt: String = "graft",
                   k: Long = 5L): DataFrame =
    parsed.filter(col("principal").isNotNull)
      .select(concat(lit("u_"),
        substring(md5(concat(lit(salt), lit(":"), col("principal"))), 1, 12))
        .as("pseudonym"), col("conv_id"))
      .groupBy("pseudonym")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("conv_id")).as("n_convs"))
      .withColumn("rare_flag", col("n_events") < k)

  /** TTL retention simulation — "what would a 7/30/90-day TTL delete?"
    * answered BEFORE the policy ships: per (source file × candidate TTL),
    * the events and bytes dropped (event older than TTL days behind the
    * corpus high-water mark) and the drop permille. The cost/compliance
    * trade-off usually differs per source (an archive feed is all-old,
    * a live feed all-new), which is why the grain is per source.
    *
    * Shape: one corpus hash-agg to (src_file, age-day) — bounded by
    * files × retention horizon — then the TTL grid applies to that
    * aggregate with a 1-row high-water-mark broadcast. */
  def ttlSimulation(parsed: DataFrame,
                    ttlDays: Seq[Int] = Seq(7, 30, 90)): DataFrame = {
    val hw = parsed.agg(max(col("ts")).as("hwm"))
    val aged = parsed.crossJoin(broadcast(hw))
      .select(col("src_file"),
        expr("(unix_micros(CAST(hwm AS TIMESTAMP))" +
          " - unix_micros(CAST(ts AS TIMESTAMP))) DIV 86400000000").as("age_d"),
        length(col("text")).cast("long").as("bytes"))
      .groupBy("src_file", "age_d")
      .agg(count(lit(1)).as("n"), sum("bytes").as("b"))
    val ttls = ttlDays.map(d => s"($d)").mkString(", ")
    val grid = aged.crossJoin(
      aged.sparkSession.sql(s"SELECT * FROM VALUES $ttls AS t(ttl_days)"))
    grid.groupBy("src_file", "ttl_days").agg(
        sum("n").as("n_events"), sum("b").as("total_bytes"),
        sum(when(col("age_d") >= col("ttl_days"), col("n")).otherwise(0L))
          .as("n_dropped"),
        sum(when(col("age_d") >= col("ttl_days"), col("b")).otherwise(0L))
          .as("bytes_dropped"))
      .withColumn("drop_permille",
        expr("n_dropped * 1000 DIV greatest(n_events, 1L)"))
      .withColumn("ttl_days", col("ttl_days").cast("long"))
}

  /** Truncated discrete-Laplace inverse-CDF thresholds for ε·1000:
    * p(k) ∝ exp(−ε·|k|), k ∈ [−bound, bound], cumulative in micro-units.
    * Computed ONCE here and embedded as constants in BOTH the Spark plan
    * and the DuckDB oracle — the noise draw itself is then pure integer
    * comparison, so determinism/parity is by construction (the
    * Lookups.state18456 pattern applied to a sampling table). The last
    * threshold is pinned to 1e6 so every uniform value maps. */
  def dpNoiseCdfMicro(epsX1000: Long, bound: Int = 15): Seq[(Int, Long)] = {
    val eps = epsX1000.toDouble / 1000.0
    val ws = (-bound to bound).map(k => math.exp(-eps * math.abs(k)))
    val total = ws.sum
    val cum = ws.scanLeft(0.0)(_ + _).tail
    (-bound to bound).zip(cum).map { case (k, c) =>
      k -> (if (k == bound) 1000000L
            else math.rint(c / total * 1000000.0).toLong)
    }
  }

  /** Differentially-private count release (simulation/audit form): per
    * (lang, source) cell, the true count plus truncated discrete-Laplace
    * noise at sensitivity 1 — the mechanism a corpus-stats dashboard
    * runs before publishing per-cohort counts. The per-cell uniform
    * comes from the salted md5 of the cell key (deterministic, so the
    * release is reproducible and oracle-checkable; a production release
    * would use a fresh secret salt per epoch and DROP n_true/noise —
    * this audit form keeps them so the gate can verify the mechanism).
    * Noise is clamped to ±bound by the truncated table; negative noisy
    * counts clamp at 0 (standard post-processing, DP-safe).
    *
    * Shape: ONE corpus hash-agg to the |langs|×|sources| grid; the
    * noise draw is a constant CASE ladder over the aggregate. */
  def dpCounts(docs: DataFrame, epsX1000: Long = 500L,
               salt: String = "graft-dp"): DataFrame = {
    val cells = docs.groupBy("lang", "source").agg(count(lit(1)).as("n_true"))
    val u = conv(substring(md5(concat_ws("|",
      col("lang"), col("source"), lit(salt))), 1, 8), 16, 10)
      .cast("long") % 1000000L
    val noise = dpNoiseCdfMicro(epsX1000).foldRight(lit(null).cast("long")) {
      case ((k, thr), acc) => when(u < thr, lit(k.toLong)).otherwise(acc)
    }
    cells.withColumn("noise", noise)
      .withColumn("n_noisy", greatest(lit(0L), col("n_true") + col("noise")))
      .withColumn("eps_x1000", lit(epsX1000))
  }
}
