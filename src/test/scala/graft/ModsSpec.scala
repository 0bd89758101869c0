package graft

import org.apache.spark.sql.functions._
import graft.operators.Mods

class ModsSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private val turns = Seq(
    ("c1", 0, "user", "event=login principal=u7 app=app_1 host=host03 Login succeeded. [CLIENT: ::1]", "sql_query",
      java.sql.Timestamp.valueOf("2024-01-01 05:00:00"))
  ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("payload nesting + adds + copy + move + casing (P8-P11)") {
    val parsed = graft.functions.Grok.parse(turns)
    val r = Mods(parsed).select("doc_json").collect()(0).getString(0)
    // JSON golden, key-order-insensitive
    val m = spark.read.json(Seq(r).toDS()).collect()(0)
    val doc = m.getStruct(m.fieldIndex("mssql"))
    assert(doc.getAs[String]("name") == "LOGIN")            // uppercase mssql.name
    assert(doc.getAs[String]("principal") == "u7")
    assert(doc.schema.fieldNames.toSet == Set("name", "principal", "tool")) // role moved out
    val g = m.getStruct(m.fieldIndex("global"))
    assert(g.getAs[String]("user") == "u7")                 // copy + lowercase
    assert(g.getAs[String]("role") == "user")               // move
    assert(g.getAs[String]("collector") == "graft")         // add
    assert(m.schema.fieldNames.contains("@timestamp"))      // timestamp lift
  }

  test("refuse-overwrite: add onto existing path is skipped (logstash_record.go:125)") {
    val cfg = Mods.defaultConfig.copy(
      adds = Mods.defaultConfig.adds :+ ("mssql.name" -> "CLOBBER"))
    val parsed = graft.functions.Grok.parse(turns)
    val r = Mods(parsed, cfg).select("doc.mssql.name").collect()(0).getString(0)
    assert(r == "LOGIN") // original value survived (then uppercased)
  }

  test("strip_crlf: newlines in payload collapse to spaces in NDJSON (P12)") {
    val t2 = Seq(("c1", 0, "user\nx", "event=login principal=a b", "t",
      java.sql.Timestamp.valueOf("2024-01-01 05:00:00")))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val r = Mods(graft.functions.Grok.parse(t2)).select("doc_json").collect()(0).getString(0)
    assert(!r.contains("\n"))
  }

  test("string-array casing is per-element and stays ArrayType (P11/E6)") {
    val t2 = Seq(("c1", 0, "user", "event=login principal=a", "sql_query",
      java.sql.Timestamp.valueOf("2024-01-01 05:00:00")))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val base = graft.functions.Enrich.withAgConstants(
      graft.functions.Grok.parse(t2))
    val cfg = Mods.ModsConfig(
      payloadField = Some("mssql"), timestampField = "@timestamp",
      payloadColumns = Seq("name", "mssql_ag"),
      adds = Nil, copies = Nil, moves = Nil,
      uppercase = Seq("mssql.mssql_ag"), lowercase = Nil, stripCrlf = false)
    val out = Mods(base, cfg).select("doc.mssql.mssql_ag")
    assert(out.schema.fields(0).dataType
      .isInstanceOf[org.apache.spark.sql.types.ArrayType])
    val arr = out.collect()(0).getSeq[String](0)
    assert(arr == graft.sources.Lookups.agGroups.map(_.toUpperCase))
  }

  test("add-value coercion ladder: bool/int/float/quoted-string (P9)") {
    import org.apache.spark.sql.types._
    val cfg = Mods.defaultConfig.copy(adds = Seq(
      "g.flag" -> "true", "g.n" -> "42", "g.hex" -> "0x1A",
      "g.ratio" -> "0.5", "g.ver" -> "'0.7'", "g.plain" -> "hello"))
    val parsed = graft.functions.Grok.parse(turns)
    val out = Mods(parsed, cfg).select("doc.g.*")
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("flag") == BooleanType)
    assert(types("n") == LongType && types("hex") == LongType)
    assert(types("ratio") == DoubleType)
    assert(types("ver") == StringType && types("plain") == StringType)
    val r = out.collect()(0)
    assert(r.getAs[Boolean]("flag") && r.getAs[Long]("n") == 42L &&
      r.getAs[Long]("hex") == 26L && r.getAs[String]("ver") == "0.7")
  }

  test("$(EXENAME)/$(EXENAMEPATH)/$(GITHASH) substring tokens (config.go:334-341)") {
    // pure substitution order + substring semantics
    assert(Mods.substituteTokens("$(EXENAME)") == "graft-engine")
    assert(Mods.substituteTokens("$(EXENAMEPATH)") == "/opt/graft/bin/graft-engine")
    assert(Mods.substituteTokens("run-$(GITHASH)-v$(VERSION)") ==
      s"run-${Mods.GitHash}-v0.1.0")
    assert(Mods.substituteTokens("$(GITDESCRIBE)") == "0.1.0")
    assert(Mods.substituteTokens("pid=$(PID)@$(HOST)") == "pid=0@graft-host")
    assert(Mods.substituteTokens("no tokens here") == "no tokens here")
    // end-to-end through the add pipeline (string-typed after coercion)
    val cfg = Mods.defaultConfig.copy(adds = Seq(
      "g.exe" -> "$(EXENAME)", "g.exep" -> "$(EXENAMEPATH)",
      "g.build" -> "sha:$(GITHASH)"))
    val parsed = graft.functions.Grok.parse(turns)
    val r = Mods(parsed, cfg).select("doc.g.*").collect()(0)
    assert(r.getAs[String]("exe") == "graft-engine")
    assert(r.getAs[String]("exep") == "/opt/graft/bin/graft-engine")
    assert(r.getAs[String]("build") == s"sha:${Mods.GitHash}")
  }

  test("$(env:VAR) substitution resolves, errors on unset (vars.go:18-44)") {
    val lookup = Map("GRAFT_USER" -> "svc_account").get _
    val cfg = Mods.defaultConfig.copy(
      adds = Seq("g.user" -> "$(env:GRAFT_USER)"), envLookup = lookup)
    val parsed = graft.functions.Grok.parse(turns)
    val r = Mods(parsed, cfg).select("doc.g.user").collect()(0).getString(0)
    assert(r == "svc_account")
    val bad = Mods.defaultConfig.copy(
      adds = Seq("g.user" -> "$(env:NOPE)"), envLookup = lookup)
    intercept[IllegalArgumentException] { Mods(parsed, bad) }
  }

  test("JSON config file parses into ModsConfig + filter rules (S7)") {
    import graft.sources.ConfigSource
    val json = """{
      "payload_field": "mssql", "timestamp_field": "@timestamp",
      "payload_columns": ["name", "role", "principal", "tool"],
      "adds": {"global.collector": "graft", "global.version": "'0.1'"},
      "copies": {"mssql.principal": "global.user"},
      "moves": {"mssql.role": "global.role"},
      "uppercase": ["mssql.name"], "lowercase": ["global.user"],
      "strip_crlf": true,
      "filters": [
        {"action": "exclude", "conditions": {"name": "wait_info"}},
        {"action": "include", "conditions": {"name": "wait_info", "tool": "sql_query"}},
        {"action": "exclude", "conditions": {"error_number": 18456, "role": "system"}}
      ],
      "sampler_duration": "minute"
    }"""
    val f = java.nio.file.Files.createTempFile("graft_cfg", ".json")
    java.nio.file.Files.write(f, json.getBytes("UTF-8"))
    val cfg = ConfigSource.load(f.toString)
    // field-by-field: envLookup is a function and never equal by value
    val m = cfg.mods; val d = Mods.defaultConfig
    assert(m.payloadField == d.payloadField && m.timestampField == d.timestampField &&
      m.payloadColumns == d.payloadColumns && m.adds == d.adds &&
      m.copies == d.copies && m.moves == d.moves &&
      m.uppercase == d.uppercase && m.lowercase == d.lowercase &&
      m.stripCrlf == d.stripCrlf)
    assert(cfg.rules == graft.operators.Filters.defaultRules)
    assert(cfg.samplerDuration == "minute")
    // the loaded config drives the operators end-to-end
    val parsed = graft.functions.Grok.parse(turns)
    val viaFile = Mods(parsed, cfg.mods).select("doc.mssql.name").collect()(0).getString(0)
    assert(viaFile == "LOGIN")
    java.nio.file.Files.delete(f)
  }

  test("to_json drops null fields (absent-key semantics)") {
    val t2 = Seq(("c1", 0, "user", "event=wait_info wait_type=X duration=5", "t",
      java.sql.Timestamp.valueOf("2024-01-01 05:00:00")))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val r = Mods(graft.functions.Grok.parse(t2)).select("doc_json").collect()(0).getString(0)
    assert(!r.contains("principal")) // null principal → key absent
  }
}
