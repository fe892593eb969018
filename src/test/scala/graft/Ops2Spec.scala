package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LuaContract
import graft.ops.LuaContract.Record
import graft.sources.Sources

/** Second-wave operators: the lua-contract UDF surface and the file
  * sources (SURVEY §2.3 lua / §2.9 in_tail analogues).
  */
class Ops2Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("lua contract: drop / keep / modify / split per return code") {
    val in = Seq(
      Record("t", 10, Map("k" -> "drop_me")),
      Record("t", 20, Map("k" -> "keep")),
      Record("t", 30, Map("k" -> "retime")),
      Record("t", 40, Map("k" -> "split"))).toDS()
    val out = LuaContract.applyTo(spark, in) { (_, ts, body) =>
      body("k") match {
        case "drop_me" => (-1, ts, Nil)
        case "keep" => (0, ts, Nil)
        case "retime" => (1, 999L, Seq(body + ("extra" -> "1")))
        case "split" => (2, ts, Seq(Map("part" -> "a"), Map("part" -> "b")))
      }
    }.collect().sortBy(_.tsSec)
    assert(out.length == 4)
    assert(out(0) == Record("t", 20, Map("k" -> "keep")))
    assert(out.count(_.body.get("part").nonEmpty) == 2) // split → 2 records
    assert(out.exists(r => r.tsSec == 999 && r.body.get("extra").contains("1")))
    assert(!out.exists(_.body.get("k").contains("drop_me")))
  }

  test("ndjson source reads typed columns; text source tags by file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toFile
    val f = new java.io.File(dir, "part1.jsonl")
    val pw = new java.io.PrintWriter(f)
    pw.println("""{"id": 1, "msg": "hello", "n": 1.5}""")
    pw.println("""{"id": 2, "msg": "world", "n": 2.5}""")
    pw.close()
    val df = Sources.ndjson(spark, f.getAbsolutePath, "id BIGINT, msg STRING, n DOUBLE")
    assert(df.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("hello", "world"))

    val lines = Sources.textLines(spark, f.getAbsolutePath)
    assert(lines.count() == 2)
    assert(lines.select("tag").head.getString(0).contains("part1.jsonl"))

    val tagged = Sources.withTag(df, "app", suffix = Some("msg"))
    assert(tagged.filter(col("tag") === "app.hello").count() == 1)
  }
}
