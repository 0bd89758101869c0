package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables for co-located joins (SURVEY.md §4 / the builder
  * brief's "bucketing for co-located joins"): two tables bucketed and
  * sorted on `conv_id` join with NO shuffle exchange — at 100 TB this is
  * the difference between a full-network shuffle and a local merge per
  * bucket. The BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, "conv_id")
      .sortBy("conv_id", "turn_idx")
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on conv_id; with matching bucketing the
    * planner emits SortMergeJoin with zero ShuffleExchange. */
  def colocatedJoin(spark: SparkSession, left: String, right: String): DataFrame =
    spark.table(left).as("l").join(spark.table(right).as("r"), "conv_id")

  /** W1 ordering straight off bucketed storage: the per-conversation
    * ordered write is the pipeline's ONLY shuffle; reading a table already
    * bucketed on conv_id satisfies the clustering requirement, so the
    * ordered sink becomes exchange-free too (a per-bucket local sort at
    * most) — at 100 TB the ordering cost moves from a full-network
    * shuffle to zero by organizing storage. */
  def orderedFromBucketed(spark: SparkSession, table: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    // no repartition: the bucketed scan already clusters conv_id per
    // bucket, so only the (free, exchange-less) local sort remains
    spark.table(table).sortWithinPartitions(col("conv_id"), col("turn_idx"))
  }
}
