package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.config.ClassicConfig

/** Classic-mode config frontend: the reference's ini-style pipeline files
  * assemble into tag-routed frames (inputs → match-gated filters →
  * stream task → formatted outputs) — the "switch without rewriting your
  * config" path.
  */
class ConfigSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("parse: sections, repeated keys, comments, key-only entries") {
    val s = ClassicConfig.parse(
      """# pipeline (full-line comment)
        |[FILTER]
        |    name  grep
        |    # rules follow
        |    regex log a
        |    regex log ERROR#\d+
        |[OUTPUT]
        |    name null
        |""".stripMargin)
    assert(s.map(_.name) == Seq("FILTER", "OUTPUT"))
    // inline '#' is part of the value (only full lines are comments)
    assert(s.head.all("regex") == Seq("log a", "log ERROR#\\d+"))
    assert(s.head.get("name").contains("grep"))
  }

  test("full conf: parser + grep + modify + stream task + routed outputs") {
    val web = Seq(
      "GET /index 200 1043",
      "GET /admin 500 12",
      "POST /login 200 88"
    ).toDF("log").withColumn("tag", lit("app.web"))
    val audit = Seq("login ok").toDF("log").withColumn("tag", lit("audit"))

    val conf =
      """[INPUT]
        |    name lib
        |    tag  app.web
        |[INPUT]
        |    name lib
        |    tag  audit
        |[PARSER]
        |    name   access
        |    format regex
        |    regex  ^(?<method>[A-Z]+) (?<uri>\S+) (?<status>\d+) (?<bytes>\d+)$
        |[FILTER]
        |    name         parser
        |    match        app.*
        |    key_name     log
        |    parser       access
        |    reserve_data on
        |[FILTER]
        |    name    grep
        |    match   app.*
        |    exclude method ^POST$
        |[FILTER]
        |    name  modify
        |    match *
        |    add   host graft-1
        |[STREAM_TASK]
        |    name errors
        |    exec SELECT COUNT(*) AS n FROM TAG:'app.*' WHERE status = '500';
        |[OUTPUT]
        |    name   file
        |    match  app.*
        |    format json
        |[OUTPUT]
        |    name  null
        |    match audit
        |""".stripMargin

    val outs = ClassicConfig.assemble(spark, conf,
      streams = Map("app.web" -> web, "audit" -> audit))

    // the SP task runs on the post-filter flow (flb_input_chunk.c:3355
    // taps the SP after the filter chain) — POST row already dropped
    val n = outs("stream_task:errors").collect().head.getAs[Long]("n")
    assert(n == 1L)

    val fileLines = outs("file:app.*").select("line").as[String].collect()
    assert(fileLines.length == 2) // POST excluded, audit routed away
    assert(fileLines.forall(_.contains("\"host\":\"graft-1\"")))
    assert(fileLines.exists(l => l.contains("\"status\":\"500\"") &&
      l.contains("\"uri\":\"/admin\"")))

    assert(outs("null:audit").count() == 0)
  }

  test("the same conf assembles a STREAMING pipeline from a streaming input") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val streamingInput = in.toDF().toDF("level", "log")
      .withColumn("tag", lit("app.web"))
    val conf =
      """[INPUT]
        |    name lib
        |    tag  app.web
        |[FILTER]
        |    name  grep
        |    match app.*
        |    regex level ^error$
        |[FILTER]
        |    name  modify
        |    match *
        |    add   host graft-1
        |[OUTPUT]
        |    name   file
        |    match  app.*
        |    format json
        |""".stripMargin
    val outs = ClassicConfig.assemble(spark, conf,
      streams = Map("app.web" -> streamingInput))
    val out = outs("file:app.*")
    assert(out.isStreaming, "config over a streaming input must stay streaming")
    val q = out.writeStream.format("memory").queryName("conf_stream")
      .outputMode("append").start()
    try {
      in.addData(("error", "boom"), ("info", "fine"), ("error", "again"))
      q.processAllAvailable()
    } finally q.stop()
    val lines = spark.table("conf_stream").select("line").as[String].collect()
    assert(lines.length == 2)
    assert(lines.forall(l => l.contains("\"level\":\"error\"") &&
      l.contains("\"host\":\"graft-1\"")))
  }

  test("rewrite_tag rule with $1 capture re-tags through the config") {
    val in = Seq(("error", 1L), ("info", 2L)).toDF("level", "id")
      .withColumn("tag", lit("app.log"))
    val conf =
      """[INPUT]
        |    name lib
        |    tag  app.log
        |[FILTER]
        |    name  rewrite_tag
        |    match app.*
        |    rule  $level ^(err)or$ alert.$1 false
        |[OUTPUT]
        |    name   file
        |    match  alert.*
        |    format json
        |""".stripMargin
    val outs = ClassicConfig.assemble(spark, conf, streams = Map("app.log" -> in))
    val lines = outs("file:alert.*").select("tag").as[String].collect()
    assert(lines.toSeq == Seq("alert.err"))
  }

  test("parser filter leaves unparseable records untouched (FLB_FILTER_NOTOUCH)") {
    val in = Seq("GET /a 200 10", "not an access line").toDF("log")
      .withColumn("tag", lit("app.web"))
    val conf =
      """[INPUT]
        |    name lib
        |    tag  app.web
        |[PARSER]
        |    name   access
        |    format regex
        |    regex  ^(?<method>[A-Z]+) (?<uri>\S+) (?<status>\d+) (?<bytes>\d+)$
        |[FILTER]
        |    name     parser
        |    match    app.*
        |    key_name log
        |    parser   access
        |[OUTPUT]
        |    name   file
        |    match  *
        |    format json
        |""".stripMargin
    val outs = ClassicConfig.assemble(spark, conf, streams = Map("app.web" -> in))
    val lines = outs("file:*").select("line").as[String].collect().toSet
    // parsed record: groups only (reserve_data off); unparsed record:
    // original log field intact, no fabricated group values
    assert(lines.exists(l => l.contains("\"method\":\"GET\"") && !l.contains("not an")))
    assert(lines.exists(l => l.contains("\"log\":\"not an access line\"")))
  }

  test("rewrite_tag Match pattern gates the rules: other tags pass untouched") {
    val in = Seq(("error", "app.log", 1L), ("error", "db.log", 2L))
      .toDF("level", "tag", "id")
    val conf =
      """[INPUT]
        |    name lib
        |    tag  app.log
        |[FILTER]
        |    name  rewrite_tag
        |    match app.*
        |    rule  $level ^error$ alert false
        |[OUTPUT]
        |    name   file
        |    match  *
        |    format json
        |""".stripMargin
    val outs = ClassicConfig.assemble(spark, conf, streams = Map("app.log" -> in))
    val tags = outs("file:*").select("tag").as[String].collect().sorted.toSeq
    // app.log (level=error) re-tagged; db.log untouched despite matching
    // the field regex — the filter's Match never admitted it
    assert(tags == Seq("alert", "db.log"))
  }

  test("duplicate outputs with the same plugin and match both survive") {
    val in = Seq(("x", 1L)).toDF("v", "id").withColumn("tag", lit("t"))
    val conf =
      """[INPUT]
        |    name lib
        |    tag  t
        |[OUTPUT]
        |    name   file
        |    match  *
        |    format json
        |[OUTPUT]
        |    name   file
        |    match  *
        |    format plain
        |""".stripMargin
    val outs = ClassicConfig.assemble(spark, conf, streams = Map("t" -> in))
    assert(outs.keySet == Set("file:*", "file:*#1"))
  }

  test("loki output: label sets from static + record-accessor values") {
    val in = Seq(
      ("checkout", "boom", 10L, 1000000000L),
      ("checkout", "ok", 11L, 2000000000L),
      ("billing", "late", 12L, 3000000000L)
    ).toDF("app", "log", "id", "ts_ns").withColumn("tag", lit("svc"))
    val conf =
      """[INPUT]
        |    name lib
        |    tag  svc
        |[OUTPUT]
        |    name   loki
        |    match  *
        |    labels job=graft,app=$app
        |""".stripMargin
    val outs = ClassicConfig.assemble(spark, conf, streams = Map("svc" -> in))
    val bodies = outs("loki:*").select("body").as[String].collect()
    assert(bodies.length == 2) // one push body per (job, app) label set
    val checkout = bodies.find(_.contains("\"app\":\"checkout\"")).get
    assert(checkout.contains("\"job\":\"graft\""))
    assert(checkout.contains("[\"1000000000\",\"{\\\"app\\\":\\\"checkout\\\",\\\"log\\\":\\\"boom\\\",\\\"id\\\":10}\"]"))
    assert(checkout.contains("\"2000000000\""))
    assert(!checkout.contains("billing"))
  }

  test("datadog output: config-driven source/service/tags, record message") {
    val in = Seq(("oops", 5L, 2000000000L))
      .toDF("log", "id", "ts_ns").withColumn("tag", lit("app.web"))
    val conf =
      """[INPUT]
        |    name lib
        |    tag  app.web
        |[OUTPUT]
        |    name       datadog
        |    match      *
        |    dd_source  nginx
        |    dd_tags    env:prod
        |    hostname   h1
        |""".stripMargin
    val outs = ClassicConfig.assemble(spark, conf, streams = Map("app.web" -> in))
    val line = outs("datadog:*").select("line").as[String].collect()(0)
    assert(line.contains("\"timestamp\":2000"))
    assert(line.contains("\"ddsource\":\"nginx\""))
    assert(line.contains("\"service\":\"app.web\"")) // defaults to the tag
    assert(line.contains("\"hostname\":\"h1\""))
    assert(line.contains("\"ddtags\":\"env:prod\""))
    assert(line.contains("\"message\":\"oops\""))
  }
}
