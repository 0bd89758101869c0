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

  // ---- widened-vocabulary fragments -----------------------------------------

  /** `statement=(.*)$` end-anchored capture, empty → null. */
  val oStatement: String =
    """NULLIF(regexp_extract(text, 'statement=(.*)$', 1), '')"""

  /** Inner XML of `xml=<tag>...</tag>` (greedy), empty → null. */
  def oInnerXml(tag: String): String =
    s"""NULLIF(regexp_extract(text, 'xml=<$tag>(.*)</$tag>', 1), '')"""

  /** Mirror of Enrich.humanDurationUs over a µs expression. */
  def oHumanDurUs(x: String): String =
    s"""CASE WHEN $x >= 3600000000 THEN CAST(floor(floor($x/1000000) / 3600) AS BIGINT) || 'h' || CAST(floor((CAST(floor($x/1000000) AS BIGINT) % 3600) / 60) AS BIGINT) || 'm'
       WHEN $x >= 60000000 THEN CAST(floor(floor($x/1000000) / 60) AS BIGINT) || 'm' || (CAST(floor($x/1000000) AS BIGINT) % 60) || 's'
       WHEN $x >= 1000000 THEN CAST(floor($x/1000000) AS BIGINT) || 's'
       WHEN $x >= 1000 THEN CAST(floor($x/1000) AS BIGINT) || 'ms'
       ELSE $x || 'us' END"""

  /** Mirror of Enrich.pagesHuman over a page-count expression. */
  def oPagesHuman(x: String): String =
    s"CASE WHEN $x >= 128 THEN CAST(floor($x / 128) AS BIGINT) || ' MB' ELSE ($x * 8) || ' KB' END"

  /** Mirror of Enrich.kbHuman. */
  def oKbHuman(kb: String): String =
    s"CASE WHEN $kb >= 1024 AND $kb % 1024 = 0 THEN CAST(floor($kb / 1024) AS BIGINT) || ' MB' ELSE $kb || ' KB' END"

  /** Mirror of Enrich.resourceUsage over µs/page column expressions. */
  def oResourceUsage(cpu: String, lr: String, pr: String, wr: String, dur: String): String =
    s"""concat_ws('; ',
      CASE WHEN $cpu IS NOT NULL THEN 'CPU: ' || CAST(floor($cpu / 1000) AS BIGINT) || 'ms' END,
      CASE WHEN $lr > 0 THEN 'L: ' || ${oPagesHuman(lr)} END,
      CASE WHEN $pr > 0 THEN 'P: ' || ${oPagesHuman(pr)} END,
      CASE WHEN $wr > 0 THEN 'W: ' || ${oPagesHuman(wr)} END,
      CASE WHEN $dur IS NOT NULL THEN 'D: ' || ${oHumanDurUs(dur)} END)"""

  /** Mirror of Grok.left(x, 300). */
  def oLeft300(x: String): String =
    s"CASE WHEN length($x) > 300 THEN substr($x, 1, 300) || '...' ELSE $x END"

  /** Mirror of Enrich.sqlDescOf given a precomputed usage expr `ru`. */
  def oSqlDesc(ru: String, txt: String): String =
    s"(CASE WHEN $ru = '' THEN '' ELSE '(' || $ru || ') ' END) || ${oLeft300(txt)}"

  // ---- documents/embeddings fragments (training-data ops) -------------------

  /** Whitespace tokens, lowered, empties dropped (DuckDB side of
    * TextAnalysis.tokens). */
  val oToks =
    """list_filter(string_split_regex(lower(text), '\s+'), t -> t != '')"""

  /** Charwise polynomial token hash (DuckDB side of TextAnalysis.tokHash):
    * fold starts at 7 via list_prepend since list_reduce has no init arg. */
  def oTokHash(v: String): String =
    s"""list_reduce(list_prepend(CAST(7 AS BIGINT), list_transform(string_split_regex($v,''), c -> CAST(unicode(c) AS BIGINT))), (acc,x) -> (acc*31 + x) % 1000000007)"""

  val oTokHashes = s"""list_transform($oToks, t -> ${oTokHash("t")})"""

  /** 3-token shingle hashes over a token-hash list column named `th`. */
  val oShingles =
    """CASE WHEN len(th) >= 3 THEN list_transform(generate_series(1, len(th)-2), j -> ((th[j]*31 + th[j+1]) % 1000000007 * 31 + th[j+2]) % 1000000007) ELSE CAST([] AS BIGINT[]) END"""

  /** Dot product of two DOUBLE[] columns (ranking-safe; see Similarity). */
  def oDot(a: String, b: String) = s"list_inner_product($a, $b)"

  def oCos(a: String, b: String) =
    s"(${oDot(a, b)} / (sqrt(${oDot(a, a)}) * sqrt(${oDot(b, b)})))"

  /** 18456 state CASE, generated from the same table as the Spark chain. */
  val oState18456: String = {
    val arms = Lookups.state18456
      .map { case (s, d) => s"WHEN $s THEN '${d.replace("'", "''")}'" }
      .mkString(" ")
    s"CASE WHEN ${oTriple(1)} = 18456 THEN (CASE ${oTriple(3)} $arms ELSE NULL END) ELSE NULL END"
  }
}
