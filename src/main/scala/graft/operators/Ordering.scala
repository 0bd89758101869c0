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

  /** base62 rendering of sequence ids, zero-padded to 12 chars — the
    * reference's sequence-id ENCODING (`pkg/seq/seq.go:30,44-47`:
    * mattheath/base62 std alphabet, `Padding(12)`); it encodes
    * `ts<<32|seq`, we encode the ordinal seq itself (W4's repo semantic
    * is the deterministic ordinal; the wall-clock high word is
    * environment, not data). ONE Scala ladder renders into BOTH dialects
    * (the shared-constant discipline): 11 base-62 digit extractions
    * (62^10 is the largest int64-safe power and 11 digits cover every
    * non-negative int64) prefixed with a literal '0' pad to width 12. */
  val Base62Alphabet =
    "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
  def base62Ladder(c: String, divOp: String): String = {
    val digits = (10 to 0 by -1).map { k =>
      val pow = BigInt(62).pow(k)
      s"substr('$Base62Alphabet', CAST(($c $divOp $pow) % 62 AS INT) + 1, 1)"
    }
    digits.mkString("'0' || ", " || ", "")
  }

  /** Global dense sequence over (conv_id, turn_idx) WITHOUT a
    * single-partition window (W4, `pkg/seq/seq.go:34-49` analog).
    * Two-phase: range-partition + sort within partitions, count per
    * partition, then add per-partition base offsets — the standard
    * scalable zip-with-index. `monotonically_increasing_id` is never used
    * for equality-checked output (SURVEY.md §2.8). */
  def globalSeq(df: DataFrame): DataFrame = {
    val sorted = df.repartitionByRange(col("conv_id"), col("turn_idx"))
      .sortWithinPartitions("conv_id", "turn_idx")
    // ONE RDD, cached before any job runs: repartitionByRange samples its
    // range boundaries per physical plan, so two independent jobs over
    // uncached plans could see different partition contents (duplicate or
    // skipped seq values). zipWithIndex's internal count job materializes
    // the cache; the map job then reads the frozen partitions. The cache is
    // released by Spark's ContextCleaner once the result frame is dropped.
    val rdd0 = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val zipped = rdd0.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1))
    }
    df.sparkSession.createDataFrame(zipped,
      sorted.schema.add("seq", org.apache.spark.sql.types.LongType))
  }

  /** Detect hot conversation keys from a sample: keys whose sampled share
    * exceeds `sharePermille` of rows. At 100 TB this runs on a 0.1%
    * sample — one cheap pass — and feeds saltedRepartition; the same
    * pattern AQE uses for skew-join splitting, applied to our ordering
    * shuffle. */
  def detectHotKeys(df: DataFrame, sharePermille: Int = 50,
                    sampleFraction: Double = 0.001): Seq[String] = {
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
