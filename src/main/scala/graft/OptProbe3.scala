package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Transcripts

/** Round-6 pipeline-stage decomposition (scratch tooling). */
object OptProbe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.prep(spark)
    val synthV = math.abs(Transcripts.synthSql("x").hashCode)
    val staged = s"/tmp/graft_bench_${math.abs(sfDir.hashCode)}_50_32_$synthV"
    val input = spark.read.parquet(staged)

    def t(label: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label ${times.min}%.3f")
    }

    t("scan-only")(input.select("conv_id", "turn_idx", "ts", "role", "tool"))
    t("scan-text")(input.select("text"))
    t("filter-raw")(operators.Filters.standardOnRaw(input)
      .select("conv_id", "turn_idx"))
    t("parse-full")(Pipeline.parse(operators.Filters.standardOnRaw(input)))
    t("enrich")(Pipeline.process(input, spark))
    val routed = Pipeline.transform(input, spark)
      .select("conv_id", "turn_idx", "ts", "name", "sink_index", "doc_json")
    t("routed-full")(routed)
    t("routed-nojson")(Pipeline.route(Pipeline.process(input, spark), spark)
      .select("conv_id", "turn_idx", "ts", "name", "sink_index"))
    spark.stop()
  }
}
