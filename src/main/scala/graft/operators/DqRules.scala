package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rule audit — the rule-TABLE-driven validator
  * that turns per-field ad-hoc checks into one compiled corpus pass. Each
  * rule is (name, applies-to predicate, ok predicate); the engine
  * compiles the whole rule set into constant expressions in a single
  * map-only scan (the Blocklist pattern), aggregates 2×|rules| counters
  * plus one deterministic violation sample per rule in ONE hash-agg to a
  * 1-row frame, and unpivots that row into the |rules|-row report. No
  * explode (a rule-set explode would fan the corpus |rules|×), no second
  * scan per rule.
  *
  * This is the contract-enforcement complement of the passive profilers:
  * fieldCoverage (q128) reports what IS present, parseHealth (q140) what
  * failed to parse; ruleAudit asserts what MUST hold (ranges, required
  * fields per event type, value shapes) and points at a first offender.
  */
object DqRules {

  /** (rule name, applies-to, ok-given-applies). A row violates a rule
    * when `appliesTo` holds and `ok` does not. */
  type Rule = (String, Column, Column)

  /** Contract rules over the parsed event frame. */
  def defaultRules: Seq[Rule] = Seq(
    ("severity_in_range",
      col("severity_num").isNotNull, col("severity_num").between(0, 25)),
    ("duration_non_negative",
      col("duration").isNotNull, col("duration") >= 0L),
    ("login_has_principal",
      col("name") === "login", col("principal").isNotNull),
    ("error_has_state",
      col("name") === "error_reported", col("state_num").isNotNull),
    ("client_addr_shape",
      col("client_addr").isNotNull,
      col("client_addr").rlike("^([0-9.]+|::1|<local machine>)$")))

  /** One compiled pass over `parsed`: per rule — rows in scope, rows in
    * violation, violation permille, and the lexicographically-first
    * offending (conv_id, turn_idx) sample key. */
  def ruleAudit(parsed: DataFrame, rules: Seq[Rule] = defaultRules): DataFrame = {
    val sampleKey = concat(col("conv_id"), lit(":"),
      lpad(col("turn_idx").cast("string"), 6, "0"))
    val aggs = rules.flatMap { case (name, applies, ok) =>
      val viol = applies && !coalesce(ok, lit(false))
      Seq(
        sum(when(applies, 1L).otherwise(0L)).as(s"c_$name"),
        sum(when(viol, 1L).otherwise(0L)).as(s"v_$name"),
        min(when(viol, sampleKey)).as(s"s_$name"))
    }
    val one = parsed.agg(aggs.head, aggs.tail: _*)
    rules.map { case (name, _, _) =>
      one.select(
        lit(name).as("rule"),
        col(s"c_$name").as("n_checked"),
        col(s"v_$name").as("n_violations"),
        expr(s"v_$name * 1000 DIV greatest(c_$name, 1L)")
          .as("viol_permille"),
        col(s"s_$name").as("first_offender"))
    }.reduce(_ unionByName _)
  }

  /** Functional-dependency audit over candidate (determinant →
    * dependent) column pairs — the schema-mining half of the contract
    * check: "does error_number determine severity?" holds exactly when
    * no determinant value maps to two dependent values. Per pair: keys
    * in scope, keys violating (>1 distinct dependent), violation
    * permille, and the smallest violating key. The FD either blesses a
    * normalization (store the dependent once per key) or flags upstream
    * corruption when a known dependency breaks.
    *
    * Shape: one hash-agg per pair on (det, dep) — vocabulary-sized for
    * event metadata columns — then a key-level agg; the pair list is
    * static so the union is plan-time. */
  def fdAudit(parsed: DataFrame,
              pairs: Seq[(String, String)] = Seq(
                ("error_number", "severity_num"),
                ("name", "xe_category"),
                ("db_id", "name"))): DataFrame =
    pairs.map { case (det, dep) =>
      val grid = parsed
        .filter(col(det).isNotNull && col(dep).isNotNull)
        .groupBy(col(det).cast("string").as("k"))
        .agg(countDistinct(col(dep)).as("n_dep"))
      grid.agg(
          count(lit(1)).as("n_keys"),
          sum(when(col("n_dep") > 1, 1L).otherwise(0L)).as("n_violating"),
          min(when(col("n_dep") > 1, col("k"))).as("first_violating_key"))
        .select(lit(s"$det->$dep").as("fd"), col("n_keys"),
          col("n_violating"),
          expr("n_violating * 1000 DIV greatest(n_keys, 1L)")
            .as("viol_permille"),
          col("first_violating_key"))
    }.reduce(_ unionByName _)
}
