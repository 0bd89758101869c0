package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the key queries — the SURVEY §4
  * audit: pushdown/pruning at the scan, broadcast joins (no shuffle in
  * enrichment), the two-projection fused-parse structure. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.prep(spark)
    println("==== routed pipeline ====")
    Pipeline.routed(spark, sfDir).explain("formatted")
    println("==== route_counts ====")
    operators.Routing.perSinkCounts(Pipeline.routed(spark, sfDir)).explain("formatted")
    println("==== minhash signatures ====")
    dedup.Dedup.signatures(spark.read.parquet(s"$sfDir/documents.parquet"))
      .explain("formatted")
    spark.stop()
  }
}
