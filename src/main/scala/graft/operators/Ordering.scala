package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stable turn ordering (W1, `pkg/app/process_session.go:117-177`): the
  * reference guarantees per-source event order by being single-threaded;
  * we guarantee per-conversation order with a window over
  * `(conv_id, turn_idx)` — the north rule's required ordering before
  * routing.
  */
object TurnOrdering {

  /** Per-conversation sequence: shuffle keyed on conv_id only. This scales
    * — partitions ~ #conversations; one hot conversation is handled below. */
  def perConvSeq(df: DataFrame): DataFrame =
    df.withColumn("seq_in_conv",
      row_number().over(Window.partitionBy("conv_id").orderBy("turn_idx")))

  /** Global dense sequence over (conv_id, turn_idx) WITHOUT a
    * single-partition window (W4, `pkg/seq/seq.go:34-49` analog).
    * Two-phase: range-partition + sort within partitions, count per
    * partition, then add per-partition base offsets — the standard
    * scalable zip-with-index. `monotonically_increasing_id` is never used
    * for equality-checked output (SURVEY.md §2.8). */
  def globalSeq(df: DataFrame): DataFrame = {
    val sorted = df.repartitionByRange(col("conv_id"), col("turn_idx"))
      .sortWithinPartitions("conv_id", "turn_idx")
    val withPid = sorted.withColumn("_pid", spark_partition_id())
    val counts = withPid.groupBy("_pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).init
    val offsetMap = counts.map(_._1).zip(offsets).toMap
    val bc = withPid.sparkSession.sparkContext.broadcast(offsetMap)
    val schema = withPid.schema
    val rdd = withPid.rdd.mapPartitionsWithIndex { (pid, it) =>
      var i = bc.value.getOrElse(pid, 0L)
      it.map { r => i += 1; Row.fromSeq(r.toSeq :+ i) }
    }
    withPid.sparkSession.createDataFrame(rdd,
        schema.add("seq", org.apache.spark.sql.types.LongType))
      .drop("_pid")
  }

  /** Detect hot conversation keys from a sample: keys whose sampled share
    * exceeds `sharePermille` of rows. At 100 TB this runs on a 0.1%
    * sample — one cheap pass — and feeds saltedRepartition; the same
    * pattern AQE uses for skew-join splitting, applied to our ordering
    * shuffle. */
  def detectHotKeys(df: DataFrame, sharePermille: Int = 50,
                    sampleFraction: Double = 0.1): Seq[String] = {
    val s = df.sample(withReplacement = false, sampleFraction, seed = 42L)
    val total = s.count()
    if (total == 0) return Nil
    s.groupBy("conv_id").count()
      .filter(col("count") * 1000 > lit(total) * sharePermille)
      .collect().map(_.getString(0)).toSeq
  }

  /** Skew-aware per-conv ordering for a known-hot key set: salt the hot
    * conversations into `nSalts` sub-groups for the expensive downstream
    * work, keeping `(salt, turn_idx)` ordering recomposable because
    * turn_idx is already dense per conversation. Used by the bench path to
    * show the salted plan; correctness queries use perConvSeq (identical
    * output, verified in tests). */
  def saltedRepartition(df: DataFrame, hotKeys: Seq[String], nSalts: Int): DataFrame = {
    val salt = when(col("conv_id").isin(hotKeys: _*),
      pmod(col("turn_idx"), lit(nSalts))).otherwise(lit(0))
    df.withColumn("_salt", salt)
      .repartition(col("conv_id"), col("_salt"))
  }
}
