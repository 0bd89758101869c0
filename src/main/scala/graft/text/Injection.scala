package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Prompt-injection heuristic scan over agent transcripts — the
  * agent-pipeline governance audit beside PII redaction (q67) and the
  * banned-term blocklist (q212): turns that try to OVERRIDE the system
  * prompt, EXFILTRATE hidden instructions, smuggle payloads through
  * ENCODING, or re-ROLE the assistant are flagged per category, and the
  * conversation rollup carries counts plus the first offending turn —
  * the unit a quarantine acts on (one injected turn taints the dialogue
  * downstream of it).
  *
  * The category patterns compile into the plan as constant regexes (the
  * Blocklist shape) restricted to RE2-safe syntax — no lookaround — so
  * the Spark (Java regex) and DuckDB (RE2) evaluations agree. Map-only
  * per-turn work + ONE conv hash-agg; text never shuffles.
  */
object Injection {

  /** (category, RE2-safe case-insensitive pattern). */
  val Patterns: Seq[(String, String)] = Seq(
    ("override",
      "(?i)(ignore (all |the )?(previous|prior|above) (instructions|messages)|disregard (your|the) (system prompt|instructions))"),
    ("exfil",
      "(?i)(reveal|print|show|repeat)[a-z ]{0,30}(system prompt|hidden instructions|initial prompt)"),
    ("encoding",
      "[A-Za-z0-9+/]{48,}={0,2}"),
    ("roleplay",
      "(?i)(you are now|pretend to be|jailbreak|developer mode|do anything now)"))

  def turnFlags(text: Column): Seq[(String, Column)] =
    Patterns.map { case (cat, re) => cat -> text.rlike(re) }

  /** [[turnFlags]] with a cheap NECESSARY-CONDITION gate conjoined before
    * each regex (literal `contains` on the pre-lowered text / a length
    * floor): every pattern's match implies its gate, so `gate && rlike`
    * is verdict-identical to the bare rlike — And short-circuits in
    * codegen, and the Java-regex battery only runs on the candidate
    * sliver instead of every turn (guide §1.2 "per-task work"). `lt`
    * must be `lower(text)`. */
  def turnFlagsGated(text: Column, lt: Column): Seq[(String, Column)] = {
    val gates: Map[String, Column] = Map(
      // "ignore (all |the )?..." / "disregard (your|the)..." both open
      // with their keyword + one space
      "override" -> (lt.contains("ignore ") || lt.contains("disregard ")),
      // every exfil alternative ends in one of these three literals
      "exfil" -> (lt.contains("system prompt") ||
        lt.contains("hidden instructions") || lt.contains("initial prompt")),
      // a 48-char class run needs ≥48 chars of text. (A fused exact
      // ≥48-run scanner was A/B'd and REJECTED: the regex engine's
      // compiled class-run loop beat the extra native walk — 2.7 s
      // scanner vs 2.1 s regex-on-gated-rows, interleaved min-of-2.)
      "encoding" -> (length(text) >= 48),
      // pure literal alternation — the gate is the exact candidate set
      "roleplay" -> (lt.contains("you are now") || lt.contains("pretend to be") ||
        lt.contains("jailbreak") || lt.contains("developer mode") ||
        lt.contains("do anything now")))
    Patterns.map { case (cat, re) => cat -> (gates(cat) && text.rlike(re)) }
  }

  /** Per-conversation injection report: per-category turn counts, total
    * flagged turns, first offending turn index, and the conversation
    * flag. Only conversations with at least one hit are returned — the
    * quarantine work-list, not a corpus-sized report. */
  def scan(transcripts: DataFrame): DataFrame = {
    // lower(text) projected once so all four gates share the one pass
    val withLt = transcripts.select(col("conv_id"), col("turn_idx"),
      col("text"), lower(col("text")).as("_lt"))
    val flags = turnFlagsGated(col("text"), col("_lt"))
    // two-step select: the flag expressions materialize ONCE, and f_any
    // derives from the flag COLUMNS — with f_any inlined alongside the
    // flags, each gate+regex sat in a conditional OR arm where codegen
    // subexpression elimination does not reach, so every flag evaluated
    // twice per row (measured ~1.5× on the whole scan). CollapseProject
    // keeps the split: non-cheap exprs referenced twice don't inline.
    val perTurn = withLt.select(
      col("conv_id") +: col("turn_idx") +:
        flags.map { case (c, f) => f.as(s"f_$c") }: _*)
      .withColumn("f_any",
        flags.map { case (c, _) => col(s"f_$c") }.reduce(_ || _))
    perTurn.groupBy("conv_id").agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("f_override"), 1L).otherwise(0L)).as("n_override"),
        sum(when(col("f_exfil"), 1L).otherwise(0L)).as("n_exfil"),
        sum(when(col("f_encoding"), 1L).otherwise(0L)).as("n_encoding"),
        sum(when(col("f_roleplay"), 1L).otherwise(0L)).as("n_roleplay"),
        sum(when(col("f_any"), 1L).otherwise(0L)).as("n_flagged"),
        min(when(col("f_any"), col("turn_idx"))).as("first_offending_turn"))
      .filter(col("n_flagged") > 0)
  }
}

