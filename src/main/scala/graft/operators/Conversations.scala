package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation-level data-quality operators over the transcript table —
  * the checks an agent-transcript training pipeline runs before the
  * corpus ever reaches tokenization.
  *
  * Both are single-exchange shapes: the per-turn window and the per-conv
  * aggregate share the conv_id partitioning (the aggregate sees its child
  * already hash-partitioned on the grouping key, so no second shuffle).
  */
object Conversations {

  /** Dialogue integrity per conversation: turn count, count of adjacent
    * same-role turns (role-alternation violations), and the opening role
    * — the structural validity signal for multi-turn training data. */
  def integrity(transcripts: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    transcripts
      .select(col("conv_id"), col("turn_idx"), col("role"))
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("role") === col("prev_role"), 1L).otherwise(0L))
          .as("n_role_repeats"),
        min(struct(col("turn_idx"), col("role"))).getField("role")
          .as("first_role"))
  }

  /** Daily content-novelty rate — the ingestion-monitoring time series a
    * continuously-fed corpus needs: per calendar day, how many arriving
    * turns carry content never seen before vs repeats of earlier days
    * (a collapsing novelty rate flags a looping scraper or a replayed
    * feed). First-seen day per content hash is one aggregate on the
    * 128-bit key; the day-level rollup joins back on the hash — the wide
    * text never shuffles. */
  def dailyNovelty(transcripts: DataFrame): DataFrame = {
    val t = transcripts.select(
      to_date(col("ts")).as("day"),
      md5(regexp_replace(lower(col("text")), "\\s+", " ").cast("binary")).as("h"))
    val firstSeen = t.groupBy("h").agg(min("day").as("first_day"))
    t.join(firstSeen, Seq("h"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_permille",
        floor(col("n_novel") * lit(1000.0) / col("n_turns")).cast("long"))
  }

  /** Canned-turn detection: a turn whose normalized text appears in
    * ≥`minConvs` DISTINCT conversations is "canned" (template greetings,
    * boilerplate tool output); reports per conversation how much of it is
    * canned. The corpus-wide hotness key is the 128-bit content hash, so
    * the wide turn text never shuffles — same scale shape as
    * hash-keyed exact dedup ([[graft.dedup.Dedup.exactByHash]]). */
  def cannedTurns(transcripts: DataFrame, minConvs: Int = 3): DataFrame = {
    val t = transcripts.select(col("conv_id"),
      md5(regexp_replace(lower(col("text")), "\\s+", " ").cast("binary")).as("h"))
    val hot = t.distinct().groupBy("h").agg(count(lit(1)).as("n_convs"))
      .filter(col("n_convs") >= minConvs)
    t.join(hot, Seq("h"), "left")
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"), count(col("n_convs")).as("n_canned"))
      .withColumn("canned_permille",
        floor(col("n_canned") * lit(1000.0) / col("n_turns")).cast("long"))
  }
}
