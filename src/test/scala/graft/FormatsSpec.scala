package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Formats

/** Edge cases of the round-7 sink body builders that the gated queries'
  * clean test data never exercises: SQL-literal quote doubling, the
  * fixed-width fractional timestamp tail, block-id layout, and the C
  * `%f` six-decimal plot render.
  */
class FormatsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("pgsqlInsert doubles embedded single quotes in tag and payload") {
    val df = Seq(("it's", """[{"a":"O'Brien"}]""")).toDF("tag", "arr")
    val stmt = df.select(Formats.pgsqlInsert("tbl", "date",
      col("tag"), col("arr")).as("s")).head.getString(0)
    assert(stmt ==
      """INSERT INTO tbl SELECT 'it''s', to_timestamp(CAST(value->>'date' as FLOAT), * FROM json_array_elements('[{"a":"O''Brien"}]');"""
      || stmt.contains("'it''s'") && stmt.contains("O''Brien")
        && stmt.endsWith("');"))
  }

  test("isoFracZ pads the fractional tail to the requested width") {
    val df = Seq((1L, 42L)).toDF("id", "nanos")
    val s = df.select(Formats.isoFracZ(
      to_timestamp(lit("2024-01-03 10:20:30")), col("nanos"), 9).as("t"))
      .head.getString(0)
    assert(s == "2024-01-03T10:20:30.000000042Z")
    val ms = df.select(Formats.isoFracZ(
      to_timestamp(lit("2024-01-03 10:20:30")), lit(7), 3).as("t"))
      .head.getString(0)
    assert(ms == "2024-01-03T10:20:30.007Z")
  }

  test("azureBlockId is base64 of md5hex(path).flb-part.%06d") {
    val df = Seq(("logs/a.log", 3L)).toDF("path", "part")
    val id = df.select(Formats.azureBlockId(col("path"), col("part")).as("b"))
      .head.getString(0)
    val decoded = new String(java.util.Base64.getDecoder.decode(id), "UTF-8")
    assert(decoded.matches("[0-9a-f]{32}\\.flb-part\\.000003"))
    // ids for one path share a single length — the Azure API requirement
    val id2 = df.select(Formats.azureBlockId(col("path"), lit(999999L)).as("b"))
      .head.getString(0)
    assert(id.length == id2.length)
  }

  test("plotLine renders C printf %f six-decimal time") {
    val df = Seq((1700000000.25, 17L)).toDF("t", "v")
    val line = df.select(Formats.plotLine(col("t"), col("v")).as("l"))
      .head.getString(0)
    assert(line == "1700000000.250000 17")
  }

  test("skywalkingLog nests the record JSON under body.json.json") {
    val df = Seq(("""{"a":1}""", 5L)).toDF("rec", "ts")
    val json = df.select(to_json(Formats.skywalkingLog(col("ts"),
      lit("svc"), lit("inst"), col("rec"))).as("j")).head.getString(0)
    assert(json ==
      """{"timestamp":5,"service":"svc","serviceInstance":"inst","body":{"json":{"json":"{\"a\":1}"}}}""")
  }
}
