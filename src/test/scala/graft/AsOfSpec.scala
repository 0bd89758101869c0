package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.AsOf

/** Generic as-of join (q183): inclusive-bound semantics and row-identity
  * against a brute-force range-join formulation. */
class AsOfSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("unionAsOf: latest-at-or-before, inclusive tie, null when no match") {
    val left = Seq(
      ("a", ts("2024-01-01 10:00:00"), 1),
      ("a", ts("2024-01-01 11:00:00"), 2),
      ("b", ts("2024-01-01 09:00:00"), 3),
      ("a", ts("2024-01-01 09:30:00"), 4)).toDF("k", "ts", "id")
    val right = Seq(
      ("a", ts("2024-01-01 10:00:00"), 100L),
      ("a", ts("2024-01-01 10:30:00"), 101L),
      ("b", ts("2024-01-01 09:30:00"), 102L)).toDF("k", "cts", "ver")
    val out = AsOf.unionAsOf(left, right, "k", "ts", "cts")
      .collect().map(r => (r.getInt(2),
        Option(r.get(3)).map(_.toString).orNull,
        Option(r.get(4)).map(_.asInstanceOf[Long]).getOrElse(-1L))).toSet
    assert(out == Set(
      (4, null, -1L),                             // before first change
      (1, "2024-01-01 10:00:00.0", 100L),         // inclusive tie
      (2, "2024-01-01 10:30:00.0", 101L),         // latest wins
      (3, null, -1L)))                            // other key, no match
  }

  test("unionAsOf == brute-force range join on a seeded corpus") {
    val left = (0 until 400).map { i =>
      (s"k${i % 5}", ts(f"2024-01-01 ${i % 24}%02d:${(i * 7) % 60}%02d:00"), i)
    }.toDF("k", "ts", "id")
    val right = (0 until 60).map { j =>
      (s"k${j % 6}", ts(f"2024-01-01 ${(j * 3) % 24}%02d:${(j * 11) % 60}%02d:00"), j.toLong)
    }.toDF("k", "cts", "ver")
      // unionAsOf requires unique (key, ts) on the right
      .groupBy("k", "cts").agg(max("ver").as("ver"))

    val got = AsOf.unionAsOf(left, right, "k", "ts", "cts")

    val brute = left.join(right, left("k") === right("k") && col("ts") >= col("cts"), "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy(left("k"), col("id"))
          .orderBy(col("cts").desc_nulls_last, col("ver").desc)))
      .filter(col("rn") === 1)
      .select(left("k"), col("ts"), col("id"), col("cts"), col("ver"))

    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
    assert(got.count() == left.count())
  }
}
