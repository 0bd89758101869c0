package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic scalable as-of join — "for every left row, the latest right row
  * with the same key whose timestamp is at or before the left row's"
  * (inclusive, DuckDB `ASOF LEFT JOIN` semantics: `l.ts >= r.ts`, greatest
  * matching `r.ts` wins, NULL payload when no right row qualifies).
  *
  * The reference's one as-of lookup (database_name backfill,
  * `/root/reference/pkg/xe/xe.go:407-431`) assumes the right side fits in
  * memory; our q12 mirrors that with a broadcast interval join. This
  * operator is the BIG-dimension complement: when the right side is a
  * change LOG (config versions, SCD streams — millions of rows at 100 TB),
  * broadcasting is impossible and a per-left-row range join is quadratic.
  *
  * Plan shape: tag both sides, `unionByName`, ONE window shuffle keyed on
  * the join key, carry the last non-null right payload forward within each
  * key's timeline (`last(_, ignoreNulls)` over rows unbounded-preceding →
  * current), keep the left rows. Cost = one Exchange + one sort — the same
  * as the sort-merge join Spark would pick for an equi-join of the two
  * sides, with no broadcast and no range explosion. At equal timestamps
  * the right row sorts FIRST (`_is_right` descending) so the inclusive
  * `>=` bound holds.
  *
  * Scale notes: partitions ~ #keys × AQE coalescing; a single hot key
  * serializes into one sort task — for hot keys pair with the
  * [[SkewWindows]] chunking or pre-aggregate the right side. Right rows
  * must be unique per (key, ts) — dedupe upstream (the q183 query folds
  * duplicates with a max before joining); otherwise which duplicate wins
  * depends on sort tie-breaking.
  */
object AsOf {

  /** As-of join `left` to `right` on `key`, matching the latest
    * `right.rightTs <= left.leftTs`. All right columns other than
    * (`key`, `rightTs`) plus `rightTs` itself are appended to the left
    * schema (NULL when no match). Column names must not collide. */
  def unionAsOf(left: DataFrame, right: DataFrame, key: String,
                leftTs: String, rightTs: String): DataFrame = {
    val payloadCols = right.columns.filterNot(_ == key).toSeq
    require(payloadCols.contains(rightTs), s"right side must carry $rightTs")
    val rTagged = right.select(
      col(key),
      col(rightTs).as("_asof_ts"),
      lit(1).as("_is_right"),
      struct(payloadCols.map(col): _*).as("_asof_payload"))
    val lTagged = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_is_right", lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col("_asof_ts").asc, col("_is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("_asof_match",
      last(col("_asof_payload"), ignoreNulls = true).over(w))
    val out = filled.filter(col("_is_right") === 0)
    val keep = left.columns.map(col).toSeq ++
      payloadCols.map(c => col("_asof_match").getField(c).as(c))
    out.select(keep: _*)
  }
}
