package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group embedding centroids — the vector aggregation behind IVF
  * (re)training, per-class prototypes and drift monitoring: an
  * element-wise mean over millions of vectors per group.
  *
  * Scale shape: posexplode to (group, dim_idx, component) → ONE hash
  * aggregation on (group, dim_idx) — partial aggregation does the heavy
  * summing map-side, so the shuffle carries groups×dims rows, not
  * vectors×dims — → re-assemble the centroid array by sorting the
  * (dim_idx, sum, count) structs. No collect, no UDAF, no driver loop.
  *
  * Determinism: a raw double sum is addition-order-dependent, and shuffle
  * order is not reproducible — so components are micro-quantized FIRST
  * (floor(x·1e6), exact in both engines) and summed as LONGS, which is
  * associative. The centroid is floor(sum/n): bit-stable at any scale and
  * any partitioning, the property a correctness gate needs.
  */
object Centroids {

  /** Centroid per value of `keyCol` (must exist alongside `embedding`). */
  def perKey(vecs: DataFrame, keyCol: String): DataFrame = {
    val exploded = vecs
      .select(col(keyCol).as("grp"),
        posexplode(col("embedding")).as(Seq("dim_idx", "comp")))
      .select(col("grp"), col("dim_idx"),
        floor(col("comp").cast("double") * 1000000.0).cast("long")
          .as("comp_x1e6"))
    exploded
      .groupBy("grp", "dim_idx")
      .agg(count(lit(1)).as("n"), sum("comp_x1e6").as("s"))
      .groupBy("grp")
      .agg(max(col("n")).as("n_vectors"),
        transform(
          array_sort(collect_list(struct(col("dim_idx"), col("s"), col("n")))),
          e => floor(e("s").cast("double") / e("n")).cast("long"))
          .as("centroid_x1e6"))
  }

  /** Group = vec_id mod `groups` (a self-contained stratum on the
    * embeddings table). */
  def perGroup(vecs: DataFrame, groups: Int = 4): DataFrame =
    perKey(vecs.withColumn("grp", col("vec_id") % groups), "grp")

  /** Per-class prototypes: embeddings joined to document labels on
    * vec_id = doc_id, then one centroid per language. The label side
    * carries two narrow columns; the join is an equi-join the planner
    * broadcasts when the label projection is small or sort-merges on the
    * shared id otherwise — either way no wide row ever shuffles twice. */
  def perLang(vecs: DataFrame, docs: DataFrame): DataFrame =
    perKey(
      vecs.join(docs.select(col("doc_id").as("vec_id"), col("lang")), "vec_id"),
      "lang")
}
