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
