package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: emails, IPv4 addresses and long
  * digit runs (phone/account-shaped) replaced by typed placeholders, plus
  * per-document match counts for audit. Pure regexp expressions — per-row
  * cost only, fuses into the scan stage at any scale.
  *
  * The patterns are written in the common Java-regex/RE2 subset (character
  * classes, bounded repetition, `\b`) so Spark and the DuckDB oracle
  * compile them identically. Replacement ORDER is part of the contract:
  * emails first (their local part may contain digits and dots that the
  * later patterns would otherwise mangle), then IPs, then digit runs.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val LongNumRe = "\\d{7,}"

  /** Scrubbed text: email → <EMAIL>, IPv4 → <IP>, 7+ digit run → <NUM>. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      LongNumRe, "<NUM>")

  private def count(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** Redacted text plus per-kind match counts (counted BEFORE scrubbing,
    * against the same precedence: IPs are counted on the email-scrubbed
    * text, digit runs on the IP-scrubbed text). */
  def redactionStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Re, "<IP>")
    docs.select(
      col("doc_id"),
      count(t0, EmailRe).as("n_emails"),
      count(t1, Ipv4Re).as("n_ips"),
      count(t2, LongNumRe).as("n_longnums"),
      regexp_replace(t2, LongNumRe, "<NUM>").as("redacted"))
  }

  /** CONVERSATION-level PII rollup — the governance unit is the
    * conversation, not the turn: one leaked email anywhere poisons the
    * whole dialogue for training. Per conversation: turns scanned, turns
    * with any PII, per-kind totals (same precedence as
    * [[redactionStats]]), the earliest offending turn (where a reviewer
    * starts), and the conversation flag.
    *
    * Scale shape: per-turn counts are pure regexp map work fused into the
    * scan; ONE conv_id hash-agg (map-side combinable — the wide text
    * never shuffles, only the small count columns do). */
  def convPiiRollup(transcripts: DataFrame): DataFrame = {
    val t0 = col("text")
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Re, "<IP>")
    transcripts.select(
        col("conv_id"), col("turn_idx"),
        count(t0, EmailRe).as("e"),
        count(t1, Ipv4Re).as("i"),
        count(t2, LongNumRe).as("n"))
      .groupBy("conv_id").agg(
        org.apache.spark.sql.functions.count(lit(1)).as("n_turns"),
        sum(when(col("e") + col("i") + col("n") > 0L, 1L).otherwise(0L))
          .as("n_pii_turns"),
        sum("e").as("n_emails"), sum("i").as("n_ips"),
        sum("n").as("n_longnums"),
        min(when(col("e") + col("i") + col("n") > 0L, col("turn_idx")))
          .as("first_pii_turn"))
      .withColumn("conv_flagged", col("n_pii_turns") > 0L)
  }
}
