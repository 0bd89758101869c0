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
}
