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
}
