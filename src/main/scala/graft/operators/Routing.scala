package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Lookups

/** Routing stage: the elastic index-routing join with default (J5,
  * `pkg/sink/sink_elastic.go:113-145`) and the per-sink fan-out frame.
  * Routing is a broadcast left join + coalesce — zero shuffle.
  */
object Routing {

  /** Adds `sink_index` = map lookup by event name else default. */
  def withSinkIndex(df: DataFrame, spark: SparkSession): DataFrame =
    df.join(broadcast(Lookups.sinkIndexMap(spark)), Seq("name"), "left")
      .withColumn("sink_index", coalesce(col("sink_index"), lit(Lookups.defaultIndex)))

  /** The three sink shapes of the reference (K1 file / K2 logstash /
    * K3 elastic): one routed frame, each sink a projection over it. The
    * per-sink aggregate counts (A2, `pkg/prom/prom.go:11-41`) that the
    * north rule verifies.
    *
    * One pass over the pipeline: a single `groupBy(name, sink_index)`
    * aggregate runs the expensive upstream exactly once (the shared `base`
    * plan's exchange is deduplicated by ReuseExchange across the three
    * views), then each sink view is a re-aggregation of that tiny frame. */
  def perSinkCounts(routed: DataFrame): DataFrame = {
    val base = routed.groupBy(col("name"), col("sink_index"))
      .agg(count(lit(1)).as("n"))
    val byName = base.groupBy(col("name")).agg(sum(col("n")).as("n"))
    val file = byName
      .select(lit("file").as("sink"), col("name").as("route_key"), col("n"))
    val logstash = byName
      .select(lit("logstash").as("sink"), col("name").as("route_key"), col("n"))
    val elastic = base.groupBy(col("sink_index")).agg(sum(col("n")).as("n"))
      .select(lit("elastic").as("sink"), col("sink_index").as("route_key"), col("n"))
    file.unionByName(logstash).unionByName(elastic)
  }

  /** Elastic bulk framing: two-line action+document pairs
    * (pkg/sink/sink_elastic.go:113-145; eshelper.go:40-151). */
  def bulkFrame(routed: DataFrame, docJson: String = "doc_json"): DataFrame =
    routed.withColumn("bulk",
      concat(lit("{\"index\":{\"_index\":\""), col("sink_index"), lit("\"}}\n"),
        col(docJson)))
}
