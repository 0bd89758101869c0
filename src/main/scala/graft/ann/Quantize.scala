package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the memory-scale path for similarity
  * search: symmetric max-abs scaling to [-127, 127]. At 100 TB a float32
  * embedding table is 4× the bytes of its int8 twin, and the quantized dot
  * product is pure integer math (deterministic across engines, and the
  * shape SIMD/Tungsten vectorizes best). Quantization itself is a per-row
  * expression — no shuffle, no UDF.
  *
  * Determinism contract: components are floor(x·127/maxabs) with all
  * arithmetic in IEEE double (float widened exactly), so Spark and DuckDB
  * produce bit-identical integer vectors; the quantized cosine is integer
  * dot / integer norms with a single final double division + sqrt — also
  * exactly reproducible. Ranking sorts the FLOORED micro-cosine (a long),
  * never a raw double, with a vec_id tie-break.
  */
object Quantize {

  private def maxAbs(emb: Column): Column =
    array_max(transform(emb, x => abs(x.cast("double"))))

  /** Embedding QA per label: vector counts, effectively-zero vectors, and
    * integer-exact squared-norm stats (×1e6 via milli-quantized
    * components) — the sanity pass a pipeline runs before ANN indexing
    * (zero vectors poison cosine; norm drift flags a bad encoder batch).
    * Map-only per row + one tiny per-label aggregate; mean is
    * floor(sum/n). The 1e3 quantization bounds per-vector norm² at
    * ~2.6e8 for unit-scale 64-dim embeddings, so the per-label Long sum
    * survives tens of billions of vectors per label without wrapping —
    * milli precision is ample for a drift/zero diagnostic ("zero" means
    * every |component| < 0.001). */
  def qaStats(vecs: DataFrame): DataFrame = {
    val q = transform(col("embedding"),
      x => floor(x.cast("double") * 1000.0).cast("long"))
    vecs
      .select(col("label").cast("long").as("label"),
        aggregate(q, lit(0L), (acc, v) => acc + v * v).as("norm2"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("norm2") === 0, 1L).otherwise(0L)).as("n_zero"),
        min("norm2").as("min_norm2"), max("norm2").as("max_norm2"),
        floor(sum(col("norm2")).cast("double") / count(lit(1))).cast("long")
          .as("mean_norm2"))
  }

  /** Matryoshka prefix-mass diagnostic (MRL, Kusupati et al. 2022): how
    * much of each vector's squared norm the first `prefixDims` components
    * carry. Embeddings trained with matryoshka losses can be TRUNCATED to
    * a prefix for cheap first-stage retrieval — but only if the mass is
    * actually front-loaded; this op measures that before a pipeline
    * commits to storing truncated vectors. Map-only milli-quantized
    * integer arithmetic (the [[qaStats]] convention), one expression pass.
    *
    * Output per vector: full and prefix squared norms (milli²-scaled),
    * the prefix share in permille, and a front_loaded flag at ≥500‰. */
  def prefixMassStats(vecs: DataFrame, prefixDims: Int = 16): DataFrame = {
    val q = transform(col("embedding"),
      x => floor(x.cast("double") * 1000.0).cast("long"))
    val qp = slice(q, 1, prefixDims)
    vecs.select(col("vec_id"),
        aggregate(q, lit(0L), (acc, v) => acc + v * v).as("norm2"),
        aggregate(qp, lit(0L), (acc, v) => acc + v * v).as("prefix2"))
      .withColumn("prefix_permille",
        when(col("norm2") > 0, expr("prefix2 * 1000 DIV norm2"))
          .otherwise(lit(0L)))
      .withColumn("front_loaded", col("prefix_permille") >= 500L)
  }

  /** Quantized vector: floor(x * 127 / maxabs) ∈ [-127, 127]. */
  def quantized(emb: Column): Column = {
    val m = maxAbs(emb)
    when(m > 0.0,
      transform(emb, x => floor(x.cast("double") * 127.0 / m).cast("long")))
      .otherwise(transform(emb, _ => lit(0L)))
  }

  /** Per-vector dequantization scale, micro-fixed-point: floor(maxabs/127 · 1e9). */
  def scaleX1e9(emb: Column): Column =
    floor(maxAbs(emb) * 1e9 / 127.0).cast("long")

  def quantize(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"), quantized(col("embedding")).as("qvec"),
      scaleX1e9(col("embedding")).as("scale_x1e9"))

  /** Quantized cosine: integer dot and norms, one final double division.
    * dim=64 · 127² keeps the accumulators far inside Long range. This is
    * the DECLARATIVE REFERENCE; the hot paths use the fused
    * [[QCos.qcosFused]] (parity-tested). */
  def qcos(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (s, v) => s + v)
    val na = aggregate(transform(a, x => x * x), lit(0L), (s, v) => s + v)
    val nb = aggregate(transform(b, x => x * x), lit(0L), (s, v) => s + v)
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))
  }

  /** The 100 TB composition: int8 STORAGE × LSH PARTITIONING. Buckets come
    * from the float embedding (assignment happens once, at ingest), the
    * search joins on the bucket id and ranks by integer-math quantized
    * cosine — so the big side is 4× smaller on disk AND only same-bucket
    * candidates are scored. Mirrors Similarity.bucketedTopK's join shape. */
  def bucketedQuantizedTopK(vecs: DataFrame, k: Int = 5, queryMod: Int = 50,
                            dim: Int = 64): DataFrame = {
    val withB = vecs.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), dim).as("bucket"),
      quantized(col("embedding")).as("qvec"))
    val q = withB.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("qvec").as("q_qvec"), col("bucket"))
    val joined = withB.join(broadcast(q), "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("qcos_x1e6",
        floor(QCos.qcosFused(col("q_qvec"), col("qvec")) * 1e6).cast("long"))
    val w = Window.partitionBy("q_id").orderBy(col("qcos_x1e6").desc, col("vec_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
        col("qcos_x1e6"))
  }

  /** Brute-force top-k over QUANTIZED vectors (broadcast query set) —
    * mirrors Similarity.bruteTopK but moves 4× fewer bytes per row and
    * ranks by the floored micro-cosine for cross-engine determinism. */
  /** Per-dimension WHITENING (standardization) — the preprocessing step
    * IVF/PQ quality rides on: a dimension with 10× the variance
    * dominates every distance, so cells and codebooks partition on it
    * alone; dividing each dimension by its corpus σ equalizes the axes
    * before any index trains. Integer-exact end to end: components
    * milli-quantize first, per-dim variance comes from the
    * (n·Σq² − (Σq)²) DIV n² identity in DECIMAL(38,0), σ =
    * ⌊√var⌋ (IEEE sqrt of an integer < 2⁵² is exactly rounded — the
    * mixturePlan precedent), whitened = (q − mean)·1000 DIV max(1, σ).
    *
    * Shape: one posexplode → 64-row per-dim hash-agg; the stats fold to
    * a ONE-ROW array via sorted collect and broadcast back, so the
    * whitening itself is a map-only zip over each vector — the corpus
    * never shuffles. */
  def whiten(vecs: DataFrame): DataFrame = {
    val qm = transform(col("embedding"),
      x => floor(x.cast("double") * 1000.0).cast("long"))
    val dims = vecs.select(posexplode(qm).as(Seq("d", "q")))
      .groupBy("d").agg(
        count(lit(1)).as("n"),
        sum("q").as("sq"),
        sum(expr("CAST(q AS DECIMAL(38,0)) * q")).as("sq2"))
      .withColumn("mean_milli", expr("sq DIV n"))
      .withColumn("var_milli2",
        expr("(n * sq2 - CAST(sq AS DECIMAL(38,0)) * sq) DIV (n * CAST(n AS DECIMAL(38,0)))"))
      .withColumn("sigma_milli",
        greatest(lit(1L),
          floor(sqrt(col("var_milli2").cast("double"))).cast("long")))
    val stats = dims.agg(array_sort(collect_list(
      struct(col("d"), col("mean_milli"), col("sigma_milli")))).as("st"))
    vecs.select(col("vec_id"), qm.as("qm"))
      .crossJoin(broadcast(stats))
      .select(col("vec_id"),
        zip_with(col("qm"), col("st"), (x, s) => {
          // sign-split floor division (numerator may be negative; both
          // engines must agree): floors of exact-integer double ratios
          // are exact below 2^53
          val num = (x - s.getField("mean_milli")).cast("double") * 1000.0
          val den = s.getField("sigma_milli").cast("double")
          when(num >= 0, floor(num / den))
            .otherwise(-floor(-num / den)).cast("long")
        }).as("white"))
  }

  def quantizedTopK(vecs: DataFrame, k: Int = 5, queryMod: Int = 50): DataFrame = {
    val q = quantize(vecs)
    val qs = q.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("qvec").as("q_qvec"))
    val joined = q.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("qcos_x1e6",
        floor(QCos.qcosFused(col("q_qvec"), col("qvec")) * 1e6).cast("long"))
    val w = Window.partitionBy("q_id").orderBy(col("qcos_x1e6").desc, col("vec_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
        col("qcos_x1e6"))
  }
}
