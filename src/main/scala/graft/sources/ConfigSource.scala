package graft.sources

import graft.operators.{Filters, Mods}

/** S7: file-backed job configuration — the analog of the reference's TOML
  * config (`pkg/config/config.go:44-156`), realized as a JSON document
  * parsed on the driver into the typed configs the operators consume
  * (ModsConfig + filter rule chain + sampler duration). Reload = restart
  * the job with the new file, the Spark-native equivalent of the
  * reference's fsnotify watcher (`pkg/app/fsnotify.go`).
  *
  * Shape:
  * {
  *   "payload_field": "mssql", "timestamp_field": "@timestamp",
  *   "payload_columns": ["name", "role"],
  *   "adds": {"global.collector": "graft"},
  *   "copies": {"mssql.principal": "global.user"},
  *   "moves": {"mssql.role": "global.role"},
  *   "uppercase": ["mssql.name"], "lowercase": ["global.user"],
  *   "strip_crlf": true,
  *   "excluded_events": ["connectivity_ring_buffer_recorded"],
  *   "filters": [{"action": "exclude", "conditions": {"name": "wait_info"}}],
  *   "sampler_duration": "hour"
  * }
  */
object ConfigSource {

  final case class JobConfig(
    mods: Mods.ModsConfig,
    excludedEvents: Seq[String],
    rules: Seq[Filters.FilterRule],
    samplerDuration: String)

  /** Parse a config JSON file (Jackson, already on the Spark classpath).
    * Unknown keys are ignored; absent keys fall back to the fixture
    * defaults so a partial file stays valid — the reference's
    * defaults-then-override merge (`pkg/config/config.go:448-449`). */
  def load(path: String): JobConfig = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8))
    import scala.jdk.CollectionConverters._

    def strSeq(field: String, dflt: Seq[String]): Seq[String] =
      if (root.has(field)) root.get(field).elements().asScala.map(_.asText()).toSeq
      else dflt
    def strPairs(field: String, dflt: Seq[(String, String)]): Seq[(String, String)] =
      if (root.has(field))
        root.get(field).fields().asScala.map(e => e.getKey -> e.getValue.asText()).toSeq
      else dflt

    val d = Mods.defaultConfig
    val mods = d.copy(
      payloadField =
        if (root.has("payload_field")) Option(root.get("payload_field").asText())
        else d.payloadField,
      timestampField =
        if (root.has("timestamp_field")) root.get("timestamp_field").asText()
        else d.timestampField,
      payloadColumns = strSeq("payload_columns", d.payloadColumns),
      adds = strPairs("adds", d.adds),
      copies = strPairs("copies", d.copies),
      moves = strPairs("moves", d.moves),
      uppercase = strSeq("uppercase", d.uppercase),
      lowercase = strSeq("lowercase", d.lowercase),
      stripCrlf =
        if (root.has("strip_crlf")) root.get("strip_crlf").asBoolean()
        else d.stripCrlf)

    val rules =
      if (!root.has("filters")) Filters.defaultRules
      else root.get("filters").elements().asScala.map { r =>
        val conds = r.get("conditions").fields().asScala.map { e =>
          val v = e.getValue
          val value: Any =
            if (v.isIntegralNumber) v.asLong()
            else if (v.isBoolean) v.asBoolean()
            else v.asText()
          e.getKey -> value
        }.toMap
        Filters.FilterRule(r.get("action").asText(), conds)
      }.toSeq

    JobConfig(
      mods = mods,
      excludedEvents = strSeq("excluded_events",
        Seq("connectivity_ring_buffer_recorded")),
      rules = rules,
      samplerDuration =
        if (root.has("sampler_duration")) root.get("sampler_duration").asText()
        else "hour")
  }
}
