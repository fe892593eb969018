package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.parse.Parsers

class ParsersSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("groupIndexes handles mixed named, bare, and non-capturing groups") {
    val p = "(?<a>\\w+) (x|y) (?:zz) (?<b>\\d+)"
    assert(Parsers.groupIndexes(p) == Map("a" -> 1, "b" -> 3))
    assert(Parsers.groupNames(p) == Seq("a", "b"))
  }

  test("regex parser: apache log line with named groups and types") {
    val df = Seq(
      """127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /api HTTP/1.0" 200 2326""",
      "garbage line"
    ).toDF("line")
    val pat = "^(?<host>[^ ]*) [^ ]* (?<user>[^ ]*) \\[(?<time>[^\\]]*)\\] " +
      "\"(?<method>\\S+)(?: +(?<path>[^\"]*?))?(?: +\\S*)?\" " +
      "(?<code>[^ ]*) (?<size>[^ ]*)$"
    val out = Parsers.regex(df, col("line"), pat,
      types = Map("code" -> "int", "size" -> "long"))
    val rows = out.collect()
    val ok = rows(0)
    assert(ok.getAs[String]("host") == "127.0.0.1")
    assert(ok.getAs[String]("method") == "GET")
    assert(ok.getAs[Int]("code") == 200)
    assert(ok.getAs[Long]("size") == 2326L)
    assert(rows(1).getAs[String]("host") == null) // unmatched => NULLs
  }

  test("strptime translation") {
    assert(Parsers.strptimeToJava("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss")
    assert(Parsers.strptimeToJava("%d/%b/%Y:%H:%M:%S %z") == "dd/MMM/yyyy:HH:mm:ss XX")
    assert(Parsers.strptimeToJava("%H:%M:%S.%L") == "HH:mm:ss.SSS")
    assert(Parsers.strptimeToJava("T%H") == "'T'HH")
  }

  test("logfmt: quoted values keep spaces, bare values split") {
    val df = Seq("""lvl=info msg="hello world" n=42""").toDF("line")
    val m = Parsers.logfmt(df, col("line"), "m")
      .select(col("m")).as[Map[String, String]].head()
    assert(m == Map("lvl" -> "info", "msg" -> "hello world", "n" -> "42"))
  }

  test("ltsv parses tab-separated key:value") {
    val df = Seq("a:1\tb:two").toDF("line")
    val m = Parsers.ltsv(df, col("line"), "m")
      .select(col("m")).as[Map[String, String]].head()
    assert(m == Map("a" -> "1", "b" -> "two"))
  }

  test("escaped decoder round-trips docker-style escapes") {
    val df = Seq("line1\\nline2\\ttabbed\\\"q\\\"").toDF("s")
    val out = df.select(Parsers.decodeEscaped(col("s"))).as[String].head()
    assert(out == "line1\nline2\ttabbed\"q\"")
  }

  test("escaped_utf8 decoder: unicode escapes, surrogate pairs, octal/hex") {
    val u = "\\" + "u0041"                 // A -> A
    val pair = "\\" + "uD83D" + "\\" + "uDE00" // surrogate pair -> U+1F600
    val lone = "\\" + "uDC00"              // lone low surrogate -> U+FFFD
    val df = Seq(s"$u \\x41 \\101 $pair $lone \\n \\q").toDF("s")
    val out = df.select(Parsers.decodeEscapedUtf8(col("s"))).as[String].head()
    assert(out == s"A A A ${new String(Character.toChars(0x1F600))} � \n q")
  }

  test("prometheus scrape parser: samples, escapes, comments, timestamps") {
    val df = Seq(
      """http_requests_total{method="GET",path="/api\"v1\""} 1027 1712345678901""",
      """node_load1 0.5""",
      """up{job="a b"} 1""",
      """# TYPE http_requests_total counter""",
      """# HELP node_load1 system load""",
      """"""
    ).toDF("line")
    val out = Parsers.promText(df, col("line")).filter(col("name").isNotNull)
      .select("name", "labels", "value", "ts_ms")
      .as[(String, Map[String, String], Double, Option[Long])].collect().toSet
    assert(out == Set(
      ("http_requests_total", Map("method" -> "GET", "path" -> "/api\"v1\""),
        1027.0, Some(1712345678901L)),
      ("node_load1", Map.empty[String, String], 0.5, None),
      ("up", Map("job" -> "a b"), 1.0, None)))
  }

  test("statsd parser: type dispatch, sample rates, incremental, bad lines") {
    val df = Seq(
      "api.req:12|c",            // counter, default rate
      "api.req:3|c|@0.1",        // counter with rate
      "cpu.load:+5|g",           // incremental gauge
      "cpu.load:-2.5|g",         // negative incremental gauge
      "cpu.load:7|g",            // absolute gauge
      "db.query:250|ms|@0",      // timer; |@0 falls back to 1.0 (statsd.c:196)
      "uniq.users:alice|s",      // set keeps the raw string
      "weird:1|m",               // 'm' without 's' → counter (get_statsd_type)
      "nocolon|c",               // no bucket → dropped (all NULL)
      "nobar:5"                  // no type → dropped
    ).toDF("line")
    val out = Parsers.statsd(df, col("line"))
      .select("bucket", "mtype", "value", "sample_rate", "incremental", "set_value")
      .as[(Option[String], Option[String], Option[Double], Option[Double],
        Option[Long], Option[String])].collect()
    assert(out(0) == ((Some("api.req"), Some("counter"), Some(12.0), Some(1.0), None, None)))
    assert(out(1) == ((Some("api.req"), Some("counter"), Some(3.0), Some(0.1), None, None)))
    assert(out(2) == ((Some("cpu.load"), Some("gauge"), Some(5.0), None, Some(1L), None)))
    assert(out(3) == ((Some("cpu.load"), Some("gauge"), Some(-2.5), None, Some(1L), None)))
    assert(out(4) == ((Some("cpu.load"), Some("gauge"), Some(7.0), None, Some(0L), None)))
    assert(out(5) == ((Some("db.query"), Some("timer"), Some(250.0), Some(1.0), None, None)))
    assert(out(6) == ((Some("uniq.users"), Some("set"), None, None, None, Some("alice"))))
    assert(out(7) == ((Some("weird"), Some("counter"), Some(1.0), Some(1.0), None, None)))
    assert(out(8) == ((None, None, None, None, None, None)))
    assert(out(9) == ((None, None, None, None, None, None)))
  }

  test("split_json_values: concatenated maps, arrays, quoted braces, fragments") {
    val df = Seq(
      """{"a":1}{"b":"}{"}  {"c":[1,2]}""",   // embedded brace inside a string
      """[{"x":1}, {"y":2}]""",               // top-level array → elements
      """{"ok":1}{"part":""",                 // trailing fragment kept verbatim
      ""
    ).toDF("body")
    val out = df.select(
      graft.functions.TextFunctions.splitJsonValues(col("body")).as("vs"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("""{"a":1}""", """{"b":"}{"}""", """{"c":[1,2]}"""))
    assert(out(1) == Seq("""{"x":1}""", """{"y":2}"""))
    assert(out(2) == Seq("""{"ok":1}""", """{"part":"""))
    assert(out(3) == Seq.empty)
  }

  test("split_json_values: top-level scalar is isolated, next map survives") {
    // splunk_prot.c:420-427 rejects non-map/array top-level values; the
    // scalar must not merge with the following valid map
    val df = Seq(
      """{"a":1}"x"{"b":2}""",         // bare string between maps
      """42 {"c":3}""",                // bare number then map
      """"quoted { brace"{"d":4}""",   // scalar containing '{' in quotes
      """true"""                        // scalar only
    ).toDF("body")
    val out = df.select(
      graft.functions.TextFunctions.splitJsonValues(col("body")).as("vs"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("""{"a":1}""", "\"x\"", """{"b":2}"""))
    assert(out(1) == Seq("42", """{"c":3}"""))
    assert(out(2) == Seq("\"quoted { brace\"", """{"d":4}"""))
    assert(out(3) == Seq("true"))
  }

  test("es bulk decode: pairing, standalone delete, update/unknown skipped") {
    val body = Seq(
      """{"index":{"_index":"a","_id":"1"}}""", """{"f":1}""",
      """{"delete":{"_index":"a","_id":"9"}}""",          // stands alone
      """{"create":{"_index":"b","_id":"2"}}""", """{"f":2}""",
      """{"update":{"_index":"a","_id":"1"}}""", """{"doc":{"f":3}}""", // skipped
      """{"nonsense":{}}""",                               // unknown op skipped
      """{"index":{"_index":"c","_id":"4"}}""", """{"f":4}"""
    ).mkString("\n")
    val out = Parsers.esBulk(Seq(body).toDF("body"), col("body"))
      .select(col("write_op"),
        coalesce(get_json_object(col("meta"), "$.index._index"),
          get_json_object(col("meta"), "$.create._index")).as("idx"),
        get_json_object(col("doc"), "$.f").as("f"))
      .as[(String, String, String)].collect().toSeq
    assert(out == Seq(("index", "a", "1"), ("create", "b", "2"),
      ("index", "c", "4")))
  }

  test("es bulk decode: blank lines, leading whitespace, dangling action") {
    val body = Seq(
      "",                                                  // leading blank
      """  {"index":{"_index":"a","_id":"1"}}""",          // ws before '{'
      """{"f":1}""",
      "",                                                  // blank between pairs
      """{"update":{"_index":"a","_id":"1"}}""",
      "",                                                  // blank inside update pair
      """{"doc":{"f":9}}""",                               // consumed, not ingested
      """{"index":{"_index":"b","_id":"2"}}""", """{"f":2}""",
      """{"create":{"_index":"z","_id":"3"}}"""            // dangling: no doc line
    ).mkString("\n")
    val out = Parsers.esBulk(Seq(body).toDF("body"), col("body"))
      .select(col("write_op"),
        coalesce(get_json_object(col("meta"), "$.index._index"),
          get_json_object(col("meta"), "$.create._index")).as("idx"),
        get_json_object(col("doc"), "$.f").as("f"))
      .as[(String, String, String)].collect().toSeq
    assert(out == Seq(("index", "a", "1"), ("index", "b", "2")))
  }

  test("splunk HEC raw decode: whole body is one {log: buffer} record") {
    // splunk_prot.c:154-230 packs the entire POST body as one record —
    // no newline split on the raw endpoint
    val out = Parsers.splunkHecRaw(
      Seq("line one\n\nline two\n").toDF("body"), col("body"))
      .select("log").as[String].collect().toSeq
    assert(out == Seq("line one\n\nline two\n"))
  }

  test("mysql_quoted decoder: quote stripping, mysql escapes, unknowns kept") {
    val df = Seq(
      "'He said \\\"hi\\\"\\tand left\\Z'",
      "\"double\\nquoted\"",
      "unquoted stays",
      "'keep \\q unknown'"
    ).toDF("s")
    val out = df.select(Parsers.decodeMysqlQuoted(col("s"))).as[String].collect()
    assert(out(0) == "He said \"hi\"\tand left" + 0x1A.toChar) // SUB from the Z escape
    assert(out(1) == "double\nquoted")
    assert(out(2) == "unquoted stays")
    assert(out(3) == "keep \\q unknown") // unknown escape keeps the backslash
  }
}
