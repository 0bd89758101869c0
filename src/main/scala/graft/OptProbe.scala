package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Transcripts

/** Scratch decomposition probes for optimization round 6 (not a driver
  * surface): times sub-plans of the expensive queries so the expensive
  * stage is identified before anything is rewritten (guide §1). */
object OptProbe {
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
    val parsedB = Pipeline.parse(input)

    def t(label: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.3f")
    }

    // ---- dq_rules decomposition ----
    t("parse-count-cols")(parsedB.select("name", "severity_num", "duration",
      "principal", "state_num", "client_addr", "conv_id", "turn_idx"))
    t("dq-agg-norlike") {
      val rules = operators.DqRules.defaultRules.filterNot(_._1 == "client_addr_shape")
      operators.DqRules.ruleAudit(parsedB, rules)
    }
    t("dq-full")(operators.DqRules.ruleAudit(parsedB))

    // ---- reword_retries decomposition ----
    val tset = array_distinct(graft.text.TextAnalysis.tokens(col("text")))
    val rows = input
      .select(col("conv_id"), col("turn_idx"), col("role"), tset.as("tset"))
      .withColumn("n_set", size(col("tset")).cast("long"))
      .select(col("conv_id"), col("turn_idx"),
        struct(col("role"), col("tset"), col("n_set")).as("v"))
    t("reword-rows")(rows)
    t("reword-rows-window") {
      val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      rows.withColumn("prev", lag(col("v"), 1).over(w))
    }
    t("reword-full")(operators.Conversations.rewordRetries(input))

    // ---- tool_edges decomposition ----
    t("edges-proj")(input.select("conv_id", "turn_idx", "tool"))
    t("edges-window") {
      val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      input.select(col("tool").as("dst"),
        lag(col("tool"), 1).over(w).as("src"))
    }
    t("edges-full")(graph.Graphs.toolTransitionEdges(input))

    // ---- arg_schema decomposition ----
    t("arg-kv-explode")(input.select(
      regexp_extract(col("text"), "^event=([a-z_0-9]+)", 1).as("name"),
      explode(regexp_extract_all(col("text"),
        lit("([a-z_0-9]+)=([^ ]*)"), lit(0))).as("kv")))
    t("arg-full")(operators.DqRules.inferSchema(input))
    spark.stop()
  }
}
