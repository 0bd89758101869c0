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
}
