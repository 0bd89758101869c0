package graft

import graft.sources.{Lookups, Transcripts}

/** DuckDB-side oracle SQL builders. Every oracle query is an independent
  * re-implementation of the operator's semantics in DuckDB SQL over the
  * *identical* transcript input (shared synthesis CTE — see
  * [[graft.sources.Transcripts]]). Dialect notes: DuckDB regexp_replace
  * needs the 'g' flag for global replacement (Spark is global by default);
  * TRY_CAST(NULLIF(x,'')) mirrors Spark's non-ANSI cast-to-null.
  */
object Oracle {

  /** Prefix a query with the transcripts CTE. */
  def withTranscripts(sql: String): String =
    s"${Transcripts.oracleCte} $sql"

  /** Transcripts CTE plus extra named CTEs. */
  def withCtes(ctes: (String, String)*)(sql: String): String = {
    val extra = ctes.map { case (n, q) => s"$n AS ($q)" }.mkString(", ")
    s"${Transcripts.oracleCte}, $extra $sql"
  }

  // Shared oracle-side parse fragments (DuckDB dialect).
  val oName = """regexp_extract(text, '^event=([a-z_0-9]+)', 1)"""
  def oTriple(g: Int) =
    s"""TRY_CAST(NULLIF(regexp_extract(text, 'Error: (\\d+), Severity: (\\d+), State: (\\d+)', $g),'') AS BIGINT)"""
  val oClient = """NULLIF(regexp_extract(text, '\[CLIENT: ([^\]\[]*)\]', 1), '')"""
  def oKvNum(key: String) =
    s"""TRY_CAST(NULLIF(regexp_extract(text, '$key=(\\d+)', 1),'') AS BIGINT)"""
  def oKvStr(key: String) =
    s"""NULLIF(regexp_extract(text, '$key=([^ ]+)', 1), '')"""
  val oPrincipal =
    s"""COALESCE(${oKvStr("principal")}, NULLIF(regexp_extract(text, 'user ''([^'']*)''', 1), ''))"""

  /** 18456 state CASE, generated from the same table as the Spark chain. */
  val oState18456: String = {
    val arms = Lookups.state18456
      .map { case (s, d) => s"WHEN $s THEN '${d.replace("'", "''")}'" }
      .mkString(" ")
    s"CASE WHEN ${oTriple(1)} = 18456 THEN (CASE ${oTriple(3)} $arms ELSE NULL END) ELSE NULL END"
  }
}
