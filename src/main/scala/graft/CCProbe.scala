package graft

import org.apache.spark.sql.functions._

/** Scratch instrumentation for connectedComponentsStar round costs
  * (optimization-round tooling, not a driver surface). */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .crossJoin(spark.range(0, 50L, 1, 32).select(col("id").as("rep")))
      .withColumn("doc_id", col("doc_id") + col("rep") * 1000000L).drop("rep")
      .repartition(64)
    val ccEdges = docs.select(col("doc_id").as("a"), (col("doc_id") + 1L).as("b"))
      .filter((col("doc_id") + 1L) % 100 =!= 0)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc] $label ${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    for (pass <- 1 to 3) {
      spark.conf.set("spark.sql.adaptive.enabled", (pass != 3).toString)
      println(s"[cc] === pass $pass (aqe=${pass != 3}) ===")
      var e = t("stage-distinct-ckpt") {
        ccEdgesInit(ccEdges)
      }
      var stats = (e.count(), -1L)
      var i = 0
      var converged = false
      while (i < 22 && !converged) {
        val next = t(s"round-$i-ckpt") {
          graph.Graphs.ccRound(e).localCheckpoint(true)
        }
        val row = t(s"round-$i-stats") {
          next.agg(count(lit(1)),
            coalesce(sum(xxhash64(col("a"), col("b"))), lit(0L))).collect()(0)
        }
        val nstats = (row.getLong(0), row.getLong(1))
        converged = nstats == stats
        stats = nstats
        e = next
        i += 1
      }
      println(s"[cc] rounds=$i")
    }
    spark.stop()
  }

  private def ccEdgesInit(edges: org.apache.spark.sql.DataFrame) =
    edges.select(col("a"), col("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true)
}
