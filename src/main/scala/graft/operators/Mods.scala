package graft.operators

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven JSON reshaping (P8-P12): payload nesting + timestamp lift
  * (`pkg/app/process_session.go:272-286`), dotted-path adds / copies / moves
  * with refuse-overwrite semantics (`pkg/logstash/logstash_record.go:118-186`),
  * upper/lower casing incl. string arrays (`logstash_record.go:58-115`), and
  * CRLF strip (`process_session.go:304-307`).
  *
  * The reference mutates a map per row; here the whole document is ONE
  * nested struct `Column` assembled from a path tree, so every mod is a
  * compile-time projection folded by Catalyst — zero per-row interpretation.
  */
object Mods {

  final case class ModsConfig(
    payloadField: Option[String],          // e.g. Some("mssql")
    timestampField: String,                // e.g. "@timestamp"
    payloadColumns: Seq[String],           // source cols nested under payload
    adds: Seq[(String, String)],           // dotted path -> literal value
    copies: Seq[(String, String)],         // src dotted -> dst dotted
    moves: Seq[(String, String)],
    uppercase: Seq[String],
    lowercase: Seq[String],
    stripCrlf: Boolean,
    envLookup: String => Option[String] = name => sys.env.get(name))

  /** The canonical config fixture (FIXTURES.md §3, mirrors
    * samples/complete.toml). version is single-quoted so the coercion
    * ladder keeps it a string (the reference's '0.7' => (string) 0.7
    * convention, logstash_record.go:205-208). */
  val defaultConfig: ModsConfig = ModsConfig(
    payloadField = Some("mssql"),
    timestampField = "@timestamp",
    payloadColumns = Seq("name", "role", "principal", "tool"),
    adds = Seq("global.collector" -> "graft", "global.version" -> "'0.1'"),
    copies = Seq("mssql.principal" -> "global.user"),
    moves = Seq("mssql.role" -> "global.role"),
    uppercase = Seq("mssql.name"),
    lowercase = Seq("global.user"),
    stripCrlf = true)

  /** Engine identity constants behind the `$(EXENAME)`-family tokens.
    * The reference reads os.Executable()/build-time ldflags
    * (config.go:316-323); a Spark job has no meaningful executable
    * path, so these are pinned deterministic engine constants (the
    * GITHASH placeholder is sha1("") — recognizably synthetic). */
  val ExeNamePath = "/opt/graft/bin/graft-engine"
  val ExeName     = "graft-engine"
  val Version     = "0.1.0"
  val GitHash     = "da39a3ee5e6b4b0d3255bfef95601890afd80709"
  val Host        = "graft-host"

  /** `$(VAR)` SUBSTRING substitutions in add values, applied at config
    * build in the reference's order (config.go:334-341):
    * EXENAMEPATH, EXENAME, PID, VERSION, GITDESCRIBE, GITHASH, HOST —
    * path/name/host lowered like the reference. Substring, not
    * whole-value: `"run-$(GITHASH)"` embeds. The whole-value `$(NOW)` /
    * `$(PID)` forms keep their TYPED column mapping in [[document]]
    * (timestamp / long) and are matched before this runs. */
  def substituteTokens(v: String): String = v
    .replace("$(EXENAMEPATH)", ExeNamePath.toLowerCase)
    .replace("$(EXENAME)", ExeName.toLowerCase)
    .replace("$(PID)", "0")
    .replace("$(VERSION)", Version)
    .replace("$(GITDESCRIBE)", Version)
    .replace("$(GITHASH)", GitHash)
    .replace("$(HOST)", Host.toLowerCase)

  /** `$(env:VAR)` substitution (pkg/config/vars.go:13-44): whole-value
    * match only; an unset/empty variable is a config error. */
  private val EnvPattern = """(?i)^\$\(env:(\w*)\)$""".r
  def resolveEnv(v: String, lookup: String => Option[String]): String =
    EnvPattern.findFirstMatchIn(v) match {
      case None => v
      case Some(m) =>
        val name = m.group(1)
        if (name.isEmpty) throw new IllegalArgumentException(s"missing variable: '$v'")
        lookup(name).filter(_.nonEmpty).getOrElse(
          throw new IllegalArgumentException(s"empty variable: '$name'"))
    }

  /** Value-coercion ladder (logstash_record.go:188-211 getValue): bool →
    * int64 (base 0: 0x/0b/0o accepted) → float64 → quoted-string unwrap →
    * string. Applied at config/plan-build time, like the reference. */
  def coerceValue(v: String): Column = {
    def goBool(s: String): Option[Boolean] = s match {
      case "1" | "t" | "T" | "TRUE" | "true" | "True" => Some(true)
      case "0" | "f" | "F" | "FALSE" | "false" | "False" => Some(false)
      case _ => None
    }
    def goLong(s: String): Option[Long] = {
      val (sign, rest) =
        if (s.startsWith("-")) (-1L, s.drop(1))
        else if (s.startsWith("+")) (1L, s.drop(1)) else (1L, s)
      val parsed =
        if (rest.startsWith("0x") || rest.startsWith("0X"))
          scala.util.Try(java.lang.Long.parseLong(rest.drop(2), 16)).toOption
        else rest.toLongOption
      parsed.map(_ * sign)
    }
    goBool(v).map(lit(_))
      .orElse(goLong(v).map(lit(_)))
      .orElse(v.toDoubleOption.map(lit(_)))
      .getOrElse {
        val unq =
          if (v.length >= 2 && v.startsWith("'") && v.endsWith("'"))
            v.substring(1, v.length - 1)
          else v
        lit(unq)
      }
  }

  // ---- dotted-path tree of Column leaves -----------------------------------
  private sealed trait Node
  private final case class Leaf(c: Column, isArr: Boolean = false) extends Node
  private final case class Branch(var kids: ListMap[String, Node]) extends Node

  private def insert(root: Branch, path: Seq[String], c: Column,
                     overwrite: Boolean, isArr: Boolean = false): Boolean =
    path match {
      case Seq(last) =>
        if (root.kids.contains(last) && !overwrite) false // refuse overwrite
        else { root.kids = root.kids.updated(last, Leaf(c, isArr)); true }
      case head +: rest =>
        val child = root.kids.get(head) match {
          case Some(b: Branch) => b
          case Some(_: Leaf)   => return false // path collides with a value
          case None =>
            val b = Branch(ListMap.empty); root.kids = root.kids.updated(head, b); b
        }
        insert(child, rest, c, overwrite, isArr)
    }

  private def lookup(root: Branch, path: Seq[String]): Option[Leaf] =
    path match {
      case Seq(last) => root.kids.get(last).collect { case l: Leaf => l }
      case head +: rest =>
        root.kids.get(head).collect { case b: Branch => b }.flatMap(lookup(_, rest))
    }

  private def remove(root: Branch, path: Seq[String]): Unit =
    path match {
      case Seq(last) => root.kids = root.kids - last
      case head +: rest =>
        root.kids.get(head).foreach { case b: Branch => remove(b, rest); case _ => }
    }

  private def toColumn(n: Node): Column = n match {
    case Leaf(c, _) => c
    case Branch(k)  => struct(k.toSeq.map { case (name, node) => toColumn(node).as(name) }: _*)
  }

  /** Build the routed document struct column `doc` per the config.
    * `arrayCols` marks which source columns are string arrays so casing
    * applies per-element (logstash_record.go:70-88 handles both). */
  def document(cfg: ModsConfig, arrayCols: Set[String] = Set.empty): Column = {
    val root = Branch(ListMap.empty)
    // P8: payload nesting + timestamp lift
    cfg.payloadField match {
      case Some(pf) =>
        cfg.payloadColumns.foreach(c =>
          insert(root, Seq(pf, c), col(c), overwrite = true, isArr = arrayCols(c)))
      case None =>
        cfg.payloadColumns.foreach(c =>
          insert(root, Seq(c), col(c), overwrite = true, isArr = arrayCols(c)))
    }
    insert(root, Seq(cfg.timestampField), col("ts"), overwrite = true)
    // P9: adds (dotted path, refuse overwrite). Value coercion happens at
    // config load in the reference (logstash_record.go:188-211); the
    // $(VAR) substitutions (config.go:314-345) map to expressions here.
    cfg.adds.foreach { case (p, v) =>
      val value: Column = v match {
        case "$(NOW)"     => current_timestamp()
        case "$(VERSION)" => lit(Version)
        case "$(HOST)"    => lit(Host)
        case "$(PID)"     => lit(0L)
        case other        =>
          coerceValue(substituteTokens(resolveEnv(other, cfg.envLookup)))
      }
      insert(root, p.split('.').toSeq, value, overwrite = false)
    }
    // P10: copies then moves (move = copy + delete; skip absent src)
    (cfg.copies ++ cfg.moves).foreach { case (s, d) =>
      lookup(root, s.split('.').toSeq)
        .foreach(l => insert(root, d.split('.').toSeq, l.c, overwrite = false, isArr = l.isArr))
    }
    cfg.moves.foreach { case (s, _) => remove(root, s.split('.').toSeq) }
    // P11: casing (after adds/copies, per merge order config.go:448-449);
    // string arrays case per-element — transform stays codegen-friendly
    def applyCase(paths: Seq[String], f: Column => Column): Unit =
      paths.foreach { p =>
        val path = p.split('.').toSeq
        lookup(root, path).foreach { l =>
          val cased = if (l.isArr) transform(l.c, f) else f(l.c)
          insert(root, path, cased, overwrite = true, isArr = l.isArr)
        }
      }
    applyCase(cfg.uppercase, upper)
    applyCase(cfg.lowercase, lower)
    toColumn(root)
  }

  /** Apply mods: adds `doc` (nested struct) and `doc_json` (NDJSON body,
    * nulls dropped = absent keys, P13) with optional CRLF strip (P12). */
  def apply(df: DataFrame, cfg: ModsConfig = defaultConfig): DataFrame = {
    // build the struct tree once; doc_json references the doc column so the
    // plan carries a single copy of the (large) struct expression
    val arrayCols = df.schema.fields
      .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
      .map(_.name).toSet
    val json = to_json(col("doc"))
    df.withColumn("doc", document(cfg, arrayCols))
      .withColumn("doc_json",
        if (cfg.stripCrlf) regexp_replace(json, "\r?\n", " ") else json)
  }
}
