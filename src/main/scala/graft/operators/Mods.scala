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
    stripCrlf: Boolean)

  /** The canonical config fixture (FIXTURES.md §3, mirrors
    * samples/complete.toml). */
  val defaultConfig: ModsConfig = ModsConfig(
    payloadField = Some("mssql"),
    timestampField = "@timestamp",
    payloadColumns = Seq("name", "role", "principal", "tool"),
    adds = Seq("global.collector" -> "graft", "global.version" -> "0.1"),
    copies = Seq("mssql.principal" -> "global.user"),
    moves = Seq("mssql.role" -> "global.role"),
    uppercase = Seq("mssql.name"),
    lowercase = Seq("global.user"),
    stripCrlf = true)

  // ---- dotted-path tree of Column leaves -----------------------------------
  private sealed trait Node
  private final case class Leaf(c: Column) extends Node
  private final case class Branch(var kids: ListMap[String, Node]) extends Node

  private def insert(root: Branch, path: Seq[String], c: Column, overwrite: Boolean): Boolean =
    path match {
      case Seq(last) =>
        if (root.kids.contains(last) && !overwrite) false // refuse overwrite
        else { root.kids = root.kids.updated(last, Leaf(c)); true }
      case head +: rest =>
        val child = root.kids.get(head) match {
          case Some(b: Branch) => b
          case Some(_: Leaf)   => return false // path collides with a value
          case None =>
            val b = Branch(ListMap.empty); root.kids = root.kids.updated(head, b); b
        }
        insert(child, rest, c, overwrite)
    }

  private def lookup(root: Branch, path: Seq[String]): Option[Column] =
    path match {
      case Seq(last) => root.kids.get(last).collect { case Leaf(c) => c }
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
    case Leaf(c)   => c
    case Branch(k) => struct(k.toSeq.map { case (name, node) => toColumn(node).as(name) }: _*)
  }

  /** Build the routed document struct column `doc` per the config. */
  def document(cfg: ModsConfig): Column = {
    val root = Branch(ListMap.empty)
    // P8: payload nesting + timestamp lift
    cfg.payloadField match {
      case Some(pf) =>
        cfg.payloadColumns.foreach(c => insert(root, Seq(pf, c), col(c), overwrite = true))
      case None =>
        cfg.payloadColumns.foreach(c => insert(root, Seq(c), col(c), overwrite = true))
    }
    insert(root, Seq(cfg.timestampField), col("ts"), overwrite = true)
    // P9: adds (dotted path, refuse overwrite). Value coercion happens at
    // config load in the reference (logstash_record.go:188-211); the
    // $(VAR) substitutions (config.go:314-345) map to expressions here.
    cfg.adds.foreach { case (p, v) =>
      val value: Column = v match {
        case "$(NOW)"     => current_timestamp()
        case "$(VERSION)" => lit("0.1.0")
        case "$(HOST)"    => lit("graft-host")
        case "$(PID)"     => lit(0L)
        case other        => lit(other)
      }
      insert(root, p.split('.').toSeq, value, overwrite = false)
    }
    // P10: copies then moves (move = copy + delete; skip absent src)
    (cfg.copies ++ cfg.moves).foreach { case (s, d) =>
      lookup(root, s.split('.').toSeq)
        .foreach(c => insert(root, d.split('.').toSeq, c, overwrite = false))
    }
    cfg.moves.foreach { case (s, _) => remove(root, s.split('.').toSeq) }
    // P11: casing (after adds/copies, per merge order config.go:448-449)
    cfg.uppercase.foreach { p =>
      val path = p.split('.').toSeq
      lookup(root, path).foreach(c => insert(root, path, upper(c), overwrite = true))
    }
    cfg.lowercase.foreach { p =>
      val path = p.split('.').toSeq
      lookup(root, path).foreach(c => insert(root, path, lower(c), overwrite = true))
    }
    toColumn(root)
  }

  /** Apply mods: adds `doc` (nested struct) and `doc_json` (NDJSON body,
    * nulls dropped = absent keys, P13) with optional CRLF strip (P12). */
  def apply(df: DataFrame, cfg: ModsConfig = defaultConfig): DataFrame = {
    // build the struct tree once; doc_json references the doc column so the
    // plan carries a single copy of the (large) struct expression
    val json = to_json(col("doc"))
    df.withColumn("doc", document(cfg))
      .withColumn("doc_json",
        if (cfg.stripCrlf) regexp_replace(json, "\r?\n", " ") else json)
  }
}
