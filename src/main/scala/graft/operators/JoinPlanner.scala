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
}
