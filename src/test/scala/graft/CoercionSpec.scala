package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.{FluentQL, Planner}

/** Property check for the lazy string→number coercion rules
  * (reference flb_sp.c:298-400 object_to_number + :799-826): a string
  * field compared to a numeric literal coerces per-value; unparseable
  * values compare false, never error. The Scala-side reference model is
  * `trim.toDoubleOption`; the planner's `try_cast(double)` must agree
  * on a generated corpus of int / float / scientific / alpha / empty /
  * signed strings (FIXTURES.md §6(3)).
  */
class CoercionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val valueGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-1000L, 1000L).map(_.toString),
    Gen.chooseNum(-1000.0, 1000.0).map(d => f"$d%.3f"),
    Gen.chooseNum(-9.0, 9.0).map(d => f"$d%.1fe2"),
    Gen.alphaStr.map(_.take(8)),
    Gen.const(""),
    Gen.const("10.30"),
    Gen.const(" 42 "),
    Gen.chooseNum(0L, 99L).map(n => s"+$n"),
    Gen.const("NaN"))

  private def sampleValues(n: Int, seed: Long): List[String] =
    Gen.listOfN(n, valueGen).apply(Gen.Parameters.default, Seed(seed)).get

  test("property: numeric coercion in WHERE matches trim.toDoubleOption model") {
    val values = sampleValues(400, seed = 42L)
    val df = values.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "bytes")
      .withColumn("tag", lit("c")).withColumn("ts_sec", lit(0L))
    val cat = Planner.Catalog(streams = Map("C" -> df), defaultStream = Some("C"))

    for (threshold <- Seq(-500, 0, 50)) {
      val got = FluentQL.sql(s"SELECT id FROM STREAM:C WHERE bytes > $threshold;", cat)
        .collect().map(_.getLong(0)).toSet
      val want = values.zipWithIndex.collect {
        case (s, i) if s.trim.toDoubleOption.exists(d => d > threshold && !d.isNaN) =>
          i.toLong
      }.toSet
      assert(got == want, s"threshold $threshold")
    }
  }

  test("property: string-literal comparison never coerces") {
    val values = sampleValues(200, seed = 7L)
    val df = values.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "bytes")
      .withColumn("tag", lit("c")).withColumn("ts_sec", lit(0L))
    val cat = Planner.Catalog(streams = Map("C" -> df), defaultStream = Some("C"))
    val got = FluentQL.sql("SELECT id FROM STREAM:C WHERE bytes = '10.30';", cat)
      .collect().map(_.getLong(0)).toSet
    val want = values.zipWithIndex.collect {
      case (s, i) if s == "10.30" => i.toLong // "10.3" must NOT match
    }.toSet
    assert(got == want)
  }
}
