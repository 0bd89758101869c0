package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-flight join planning diagnostics — the checks a pipeline runs
  * BEFORE committing to a corpus-sized shuffle, so skew is handled by
  * design (salting, AQE hints, broadcast) rather than discovered as a
  * straggler task at hour three.
  */
object JoinPlanner {

  /** Join-size forecast from per-key histograms: for an equi-join of
    * `left` ⋈ `right` on `key`, the output contributed by key k is
    * exactly n_left(k)·n_right(k). Both histograms are one
    * map-side-combinable hash-agg (cost ∝ distinct keys, not rows), and
    * their equi-join is aggregate-sized — orders of magnitude cheaper
    * than the join being planned. Keys forecast above `minPairs` come
    * back with an `exploding` flag at 10×; feed the flagged keys to
    * [[TurnOrdering.saltedRepartition]] or split them into a broadcast
    * side-channel. The same histogram shape AQE uses for skew-join
    * splitting, available BEFORE execution. */
  def joinForecast(left: DataFrame, right: DataFrame, key: String,
                   minPairs: Long = 1000L): DataFrame = {
    val la = left.groupBy(key).agg(count(lit(1)).as("n_left"))
    val ra = right.groupBy(key).agg(count(lit(1)).as("n_right"))
    la.join(ra, Seq(key))
      .withColumn("pairs", col("n_left") * col("n_right"))
      .filter(col("pairs") >= minPairs)
      .withColumn("exploding", col("pairs") >= minPairs * 10L)
  }

  /** Skew-salted inner equi-join, given a `hot` key frame (one `key`
    * column; from [[joinForecast]], [[TurnOrdering.detectHotKeys]], or a
    * known list). Hot left rows scatter across `salt` sub-keys by a
    * deterministic payload hash; hot right rows REPLICATE ×salt so every
    * sub-key finds its match; cold keys pay nothing (salt 0, one replica).
    * The result equals the plain join row-for-row (proven in
    * OperatorsSpec) — only the partition histogram changes: the hottest
    * key's partition shrinks ~salt×, which at 100 TB is the difference
    * between a straggler task holding the stage for hours and an even
    * finish. Fully declarative — the hot set rides a broadcast join, no
    * driver-side collect of keys. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                     hot: DataFrame, salt: Int = 8): DataFrame = {
    val hotFlag = broadcast(hot.select(col(key)).distinct()
      .withColumn("_hot", lit(true)))
    val l = left.join(hotFlag, Seq(key), "left")
      .withColumn("_salt", when(col("_hot"),
        pmod(xxhash64(left.columns.map(col): _*), lit(salt)).cast("int"))
        .otherwise(0))
      .drop("_hot")
    val r = right.join(hotFlag, Seq(key), "left")
      .withColumn("_salt",
        explode(sequence(lit(0), when(col("_hot"), salt - 1).otherwise(0))))
      .drop("_hot")
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Convenience: detect hot keys from exact left-side counts (the
    * histogram is aggregate-sized, so this is a cheap extra pass at test
    * scale; at 100 TB feed a sampled detector or a prior forecast
    * instead) and salt the join on them. */
  def saltedEquiJoinAuto(left: DataFrame, right: DataFrame, key: String,
                         salt: Int = 8, minCount: Long = 1000L): DataFrame = {
    val hot = left.groupBy(key).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= minCount)
    saltedEquiJoin(left, right, key, hot, salt)
  }

  /** Three-way join-ORDER advisor from exact per-key histograms — the
    * cost-based-reordering evidence a pipeline wants BEFORE shuffling
    * the corpus three ways: for A ⋈ B ⋈ C on one key, all left-deep
    * orders produce the same final Σ_k aₖbₖcₖ rows but differ in the
    * INTERMEDIATE they materialize (|X⋈Y| = Σ_k xₖyₖ), and the
    * histogram join computes every candidate's intermediate exactly at
    * aggregate cost. Output: one row per order with its intermediate
    * size, the shared final size, and `best` on the minimum (ties to
    * the lexically-first order name) — what Catalyst's CBO estimates
    * from NDV sketches, here exact because the histograms are cheap.
    *
    * Shape: three map-side-combinable key hash-aggs (cost ∝ distinct
    * keys), two full-outer equi-joins OF AGGREGATES, one 1-row sum in
    * DECIMAL(38,0) (aₖbₖcₖ passes int64 under hot keys), and a 3-row
    * report. The corpus itself never shuffles. */
  def joinOrderAdvisor(a: DataFrame, b: DataFrame, c: DataFrame,
                       key: String): DataFrame = {
    def hist(df: DataFrame, out: String) =
      df.groupBy(key).agg(count(lit(1)).as(out))
    val g = hist(a, "na")
      .join(hist(b, "nb"), Seq(key), "full_outer")
      .join(hist(c, "nc"), Seq(key), "full_outer")
      .select(coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"),
        coalesce(col("nc"), lit(0L)).as("nc"))
    val sums = g.agg(
      sum(expr("CAST(na AS DECIMAL(38,0)) * nb")).as("ab"),
      sum(expr("CAST(na AS DECIMAL(38,0)) * nc")).as("ac"),
      sum(expr("CAST(nb AS DECIMAL(38,0)) * nc")).as("bc"),
      sum(expr("CAST(na AS DECIMAL(38,0)) * nb * nc")).as("abc"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(
      col("intermediate_rows").asc, col("join_order").asc)
    sums.select(explode(array(
        struct(lit("(A*B)*C").as("o"), col("ab").cast("long").as("i")),
        struct(lit("(A*C)*B").as("o"), col("ac").cast("long").as("i")),
        struct(lit("(B*C)*A").as("o"), col("bc").cast("long").as("i"))))
        .as("e"), col("abc").cast("long").as("final_rows"))
      .select(col("e.o").as("join_order"),
        col("e.i").as("intermediate_rows"), col("final_rows"))
      .withColumn("best", row_number().over(w) === 1)
  }
}
