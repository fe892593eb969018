package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.{FluentQL, ParseException, Parser, Planner}
import graft.sql.Ast._

/** Ports the reference SP unit corpus semantics
  * (tests/internal/include/sp_select_keys.h, sp_window.h,
  * sp_invalid_queries.h — see FIXTURES.md §1/§3) against an own-built
  * samples stream: 11 records, sparse keys, mixed-type `bytes`
  * (int / float / numeric string), `word3` null vs empty-string.
  */
class FluentQLSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // (id, word1, word2, word3, bytes, bool, usage) — bytes as string column
  // holding int/float/string-numeric forms, the schemaless mixed-type case.
  private lazy val samples: DataFrame = Seq(
    (0L, Some("alpha"), Some("blue"), Some("x"), "1", true, 10L),
    (1L, Some("beta"), Some("rlz"), Some("y"), "2", false, 20L),
    (2L, Some("gamma"), None, Some("rlz"), "3.5", true, 30L),
    (3L, Some("delta"), None, Some(""), "4", false, 40L),
    (4L, Some("eps"), None, Some("z"), "10.30", true, 50L),
    (5L, None, None, Some("w"), "6", false, 60L),
    (6L, Some("zeta"), None, Some("v"), "7.2", true, 70L),
    (7L, Some("eta"), None, Some("u"), "8", false, 80L),
    (8L, Some("theta"), None, Some("t"), "9", true, 90L),
    (9L, Some("iota"), None, Some("s"), "10.29", false, 100L),
    (10L, Some("kappa"), None, None, "11", true, 110L)
  ).toDF("id", "word1", "word2", "word3", "bytes", "bool", "usage")
    .withColumn("tag", lit("samples"))
    .withColumn("ts_sec", lit(1704067200L) + col("id"))

  private lazy val cat = Planner.Catalog(
    streams = Map("FLB" -> samples), defaultStream = Some("FLB"))

  private def run(q: String): DataFrame = FluentQL.sql(q, cat)

  test("SELECT * returns all records and columns") {
    val out = run("SELECT * FROM STREAM:FLB;")
    assert(out.count() == 11)
    assert(out.columns.contains("word2"))
  }

  test("projection of sparse key yields NULL for absent values") {
    val out = run("SELECT id, word2 FROM STREAM:FLB;")
    assert(out.count() == 11)
    assert(out.filter(col("word2").isNotNull).count() == 2)
  }

  test("string→number coercion: bytes > 10.290 includes the '10.30' record") {
    val ids = run("SELECT id FROM STREAM:FLB WHERE bytes > 10.290;")
      .as[Long].collect().toSet
    assert(ids == Set(4L, 10L)) // "10.30" coerces; "10.29" does not pass
  }

  test("IS NULL distinguishes null from empty string") {
    assert(run("SELECT id FROM STREAM:FLB WHERE word3 IS NULL;")
      .as[Long].collect().toSet == Set(10L))
    assert(run("SELECT id FROM STREAM:FLB WHERE word3 IS NOT NULL;").count() == 10)
  }

  test("OR over sparse keys with NULL⇒false semantics") {
    val ids = run("SELECT id FROM STREAM:FLB WHERE word2 = 'rlz' OR word3 = 'rlz';")
      .as[Long].collect().toSet
    assert(ids == Set(1L, 2L))
  }

  test("bool != true") {
    assert(run("SELECT id FROM STREAM:FLB WHERE bool != true;").count() == 5)
  }

  test("global aggregates: MIN/MAX/COUNT/SUM/AVG with coercion over bytes") {
    val row = run(
      """SELECT MIN(id) AS mn, MAX(id) AS mx, COUNT(*) AS n,
        SUM(bytes) AS sb, AVG(bytes) AS ab FROM STREAM:FLB;""").collect().head
    assert(row.getAs[Long]("mn") == 0L && row.getAs[Long]("mx") == 10L)
    assert(row.getAs[Long]("n") == 11L)
    assert(math.abs(row.getAs[Double]("sb") - 72.29) < 1e-9)
    assert(math.abs(row.getAs[Double]("ab") - 72.29 / 11) < 1e-9)
  }

  test("group-by with WHERE runs filter before aggregation") {
    val out = run(
      """SELECT bool, MIN(id) AS mn, MAX(id) AS mx, COUNT(*) AS n
        FROM STREAM:FLB WHERE word3 IS NOT NULL GROUP BY bool;""")
      .orderBy("bool").collect()
    assert(out.length == 2)
    val f = out(0); val t = out(1)
    assert(!f.getAs[Boolean]("bool") && f.getAs[Long]("n") == 5)
    assert(t.getAs[Boolean]("bool") && t.getAs[Long]("n") == 5)
    assert(t.getAs[Long]("mx") == 8L) // id=10 (bool=true) filtered by IS NOT NULL
  }

  test("<> inequality with numeric coercion (select_not_equal_2)") {
    // bytes <> 10: every record whose bytes parses and differs from 10 —
    // all 11 rows here (none equals exactly 10; '10.30'/'10.29' differ).
    val out = run("SELECT id FROM STREAM:FLB WHERE bytes <> 10;")
    assert(out.count() == 11)
  }

  test("TAG:'no-matches' selects nothing (select_from_tag_error)") {
    val none = run("SELECT id FROM TAG:'no-matches' WHERE bytes > 10;")
    assert(none.count() == 0)
    val some = run("SELECT id FROM TAG:'samples' WHERE bytes > 10;")
    assert(some.count() > 0)
  }

  test("@record.contains() key-existence predicate") {
    val ids = run("SELECT id FROM TAG:'sam*' WHERE @record.contains(word2);")
      .as[Long].collect().toSet
    assert(ids == Set(0L, 1L))
  }

  test("tumbling window groups by event-time bucket") {
    val out = run(
      "SELECT SUM(usage) AS su FROM STREAM:FLB WINDOW TUMBLING (5 SECOND);")
    assert(out.columns.toSeq == Seq("wstart", "su"))
    assert(out.count() == 3) // 11 records, 1/sec, 5s buckets
    assert(out.agg(sum("su")).head.getLong(0) == (10L to 110L by 10).sum)
  }

  test("hopping window: records land in size/advance windows") {
    val out = run(
      """SELECT COUNT(*) AS n FROM STREAM:FLB
        WINDOW HOPPING (4 SECOND, ADVANCE BY 2 SECOND);""")
    assert(out.agg(sum("n")).head.getLong(0) == 22) // 2 windows per record
  }

  test("CREATE STREAM re-tags the result") {
    val out = run(
      "CREATE STREAM hot WITH (tag='hot') AS SELECT * FROM STREAM:FLB WHERE usage > 90;")
    assert(out.select("tag").distinct().as[String].collect().toSeq == Seq("hot"))
    assert(out.count() == 2)
  }

  test("forecast over monotone usage predicts linear continuation") {
    val fc = run(
      "SELECT TIMESERIES_FORECAST(usage, 20) FROM STREAM:FLB;")
      .collect().head.getDouble(0)
    // usage = 10*(x+1) exactly ⇒ forecast at x=max+20 is 10*(10+20)+10
    assert(math.abs(fc - 310.0) < 1e-6, s"forecast=$fc")
  }

  test("NOW() and UNIX_TIMESTAMP() project per record (flb_sp_func_time.c)") {
    val out = run(
      "SELECT id, NOW() AS now_s, UNIX_TIMESTAMP() AS uts FROM STREAM:FLB WHERE bytes > 10;")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(1).matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}"))
      assert(r.getLong(2) > 1700000000L)
    }
  }

  test("@record.time() compares as a numeric value (sql.y:370-373)") {
    val out = run("SELECT id FROM STREAM:FLB WHERE @record.time() >= 1704067205;")
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(5L, 6L, 7L, 8L, 9L, 10L))
  }

  test("nested subkeys: 3-level map paths, missing path is NULL " +
    "(sp_select_subkeys.h / flb_sp_key.c:98-166)") {
    // samples-subkeys shape: map.sub1.sub2 with heterogeneous values
    val subkeys = Seq(
      (0L, Map("sub1" -> Map("sub2" -> "50"), "color" -> Map.empty[String, String])),
      (1L, Map("sub1" -> Map("sub2" -> "60", "sub3" -> "70"))),
      (2L, Map("other" -> Map("x" -> "1")))
    ).toDF("id", "map")
      .withColumn("tag", lit("samples"))
      .withColumn("ts_sec", lit(1704067200L) + col("id"))
    val kcat = Planner.Catalog(streams = Map("SK" -> subkeys), defaultStream = Some("SK"))

    // numeric coercion on a nested map path
    val hit = FluentQL.sql(
      "SELECT id FROM STREAM:SK WHERE map['sub1']['sub2'] > 55;", kcat)
    assert(hit.collect().map(_.getLong(0)).toSeq == Seq(1L))

    // missing path ⇒ NULL ⇒ filtered out, never an error
    val miss = FluentQL.sql(
      "SELECT id FROM STREAM:SK WHERE map['sub1']['nope'] = 1;", kcat)
    assert(miss.count() == 0)

    // @record.contains on a nested path = existence
    val exists = FluentQL.sql(
      "SELECT id FROM STREAM:SK WHERE @record.contains(map['sub1']['sub3']);", kcat)
    assert(exists.collect().map(_.getLong(0)).toSeq == Seq(1L))

    // projection of a nested path with alias
    val proj = FluentQL.sql(
      "SELECT id, map['sub1']['sub2'] AS s2 FROM STREAM:SK;", kcat)
    assert(proj.orderBy("id").collect().map(r => Option(r.getString(1))).toSeq ==
      Seq(Some("50"), Some("60"), None))
  }

  test("catalog views open the full Spark SQL surface beyond the reference dialect") {
    // the reference grammar has no JOIN / ORDER BY / HAVING (SURVEY
    // §2.1 dialect gaps) — registered views provide them as extensions
    cat.registerViews()
    val joined = spark.sql(
      """SELECT a.id, a.word1, b.usage FROM FLB a
        |JOIN FLB b ON a.id = b.id
        |WHERE a.bool GROUP BY a.id, a.word1, b.usage
        |HAVING sum(b.usage) > 20 ORDER BY a.id DESC LIMIT 3""".stripMargin)
    val ids = joined.select("id").as[Long].collect().toSeq
    assert(ids == ids.sorted.reverse && ids.nonEmpty && ids.length <= 3)
  }

  test("invalid queries are rejected (sp_invalid_queries.h)") {
    assertThrows[ParseException](run("SELECT *, COUNT(id) FROM STREAM:FLB;"))
    assertThrows[ParseException](run("SELECT id FROM STREAM:FLB WHERE bool = NULL;"))
    assertThrows[ParseException](
      run("SELECT id, COUNT(*) FROM STREAM:FLB;")) // bare key without GROUP BY
    assertThrows[ParseException](run("SELECT id FROM STREAM:FLB WHERE @record.bogus(id);"))
  }

  test("parser handles LIMIT, aliases, parens, NOT") {
    val out = run(
      """SELECT id AS rid FROM STREAM:FLB
        WHERE NOT (bool = false) AND bytes >= 1 LIMIT 3;""")
    assert(out.columns.toSeq == Seq("rid"))
    assert(out.count() == 3)
  }

  test("parse round trip: window + group by + where AST shape") {
    val stmt = Parser.parse(
      """SELECT bool, SUM(bytes) FROM STREAM:FLB WINDOW HOPPING (5 SECOND,
        ADVANCE BY 2 SECOND) WHERE word3 IS NOT NULL GROUP BY bool;""")
    stmt match {
      case s: Select =>
        assert(s.window.contains(Hopping(5, 2)))
        assert(s.groupBy == Seq(Key(Seq("bool"))))
        assert(s.where.exists(_.isInstanceOf[IsNull]))
      case other => fail(s"unexpected $other")
    }
  }
}
