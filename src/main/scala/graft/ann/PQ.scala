package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-scale ANN representation: split
  * each `Dim`-component vector into `M` sub-vectors, quantize every
  * sub-vector to its nearest codebook centroid, and store only the `M`
  * small codes (64 floats → 8 bytes/vector, the compression that makes
  * billion-vector indexes fit in RAM). Search uses ADC (asymmetric
  * distance computation): per query, precompute the M×K table of
  * sub-distances to every centroid ONCE, then score each stored vector
  * with M table lookups — no float math per candidate.
  *
  * Determinism: components are micro-quantized (floor(x·1e6)) before any
  * distance math, so sub-distances are exact integer sums and the
  * argmin/top-k orderings (ties → smaller id) are bit-stable across
  * engines. Codebooks are the deterministic modulus sample of the corpus
  * itself (same convention as [[Similarity.ivfCentroids]]; real systems
  * train them with [[Centroids.kmeansIteration]]).
  *
  * Scale shape: encoding is a broadcast n×(M·K) pass whose shuffle
  * carries M rows per vector (partial aggregation collapses the K
  * candidates map-side); search broadcasts the per-query distance TABLES
  * (M·K longs each) and scans the codes table map-only — the only
  * exchange is the final per-query top-k window, keyed on q_id.
  */
object PQ {

  val Dim = 64
  val M = 8          // subspaces
  val SubDim = 8     // Dim / M
  // dtable key = m·stride + code_idx. The stride bounds the codebook id
  // space: code_idx < 2^40 (vec_id < centMod·2^40 ≈ 5.5e13 at the default)
  // keeps keys collision-free and m·stride ≤ 8·2^40 far inside Long; real
  // deployments additionally remap codebook ids densely, where K ≤ 65536
  // by construction.
  val KeyStride = 1L << 40

  /** Micro-quantized copy of the embeddings: (vec_id, q: array<long>). */
  def quantized(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 1000000.0).cast("long")).as("q"))

  /** Squared L2 between two equal-length long arrays. */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** Codebook rows (m, code_idx, csub): sub-vector `m` of every sampled
    * centroid, with the dense code index c_id / centMod. */
  def codebook(vecs: DataFrame, centMod: Int = 50): DataFrame =
    quantized(vecs.filter(col("vec_id") % centMod === 0))
      .select((col("vec_id") / centMod).cast("long").as("code_idx"), col("q"))
      .select(col("code_idx"), explode(sequence(lit(0), lit(M - 1))).as("m"), col("q"))
      .select(col("m").cast("long").as("m"), col("code_idx"),
        slice(col("q"), col("m") * SubDim + 1, lit(SubDim)).as("csub"))

  /** PQ encoding: (vec_id, codes: array<long> of length M), code m =
    * argmin over the codebook of the integer sub-distance. */
  def encode(vecs: DataFrame, centMod: Int = 50): DataFrame = {
    val cb = codebook(vecs, centMod)
    quantized(vecs)
      .crossJoin(broadcast(cb))
      .withColumn("d", l2sq(slice(col("q"), col("m") * SubDim + 1, lit(SubDim)),
        col("csub")))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("d"), col("code_idx"))).getField("code_idx").as("code"))
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
        e => e.getField("code")).as("codes"))
  }

  /** ADC top-k: per query, the k nearest stored vectors by summed
    * sub-distance table lookups. Returns (q_id, neighbor_id, rank,
    * adc_dist). */
  def adcTopK(vecs: DataFrame, k: Int = 5, queryMod: Int = 53,
              centMod: Int = 50): DataFrame = {
    val cb = codebook(vecs, centMod)
    val codes = encode(vecs, centMod)
    // per-query distance table: key m·KeyStride + code_idx → sub-distance
    val dt = quantized(vecs.filter(col("vec_id") % queryMod === 0))
      .crossJoin(broadcast(cb))
      .withColumn("d", l2sq(slice(col("q"), col("m") * SubDim + 1, lit(SubDim)),
        col("csub")))
      .groupBy(col("vec_id").as("q_id"))
      .agg(map_from_entries(collect_list(
        struct((col("m") * KeyStride + col("code_idx")).as("k"), col("d").as("v"))))
        .as("dtable"))
    val scored = codes.crossJoin(broadcast(dt))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adc_dist",
        aggregate(transform(sequence(lit(0L), lit(M - 1L)),
          m => element_at(col("dtable"), m * KeyStride + element_at(col("codes"), (m + 1).cast("int")))),
          lit(0L), _ + _))
    val w = Window.partitionBy("q_id").orderBy(col("adc_dist"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
        col("adc_dist"))
  }
}
