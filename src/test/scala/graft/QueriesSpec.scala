package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.codegen.maxFields", "256") // k=128 minhash agg stays codegen'd
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // bucketed-table specs saveAsTable into a throwaway warehouse
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .withExtensions(new GraftExtensions) // SQL surface under test too
    .getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

class QueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("every registered query runs and returns rows at sf0.001") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try {
        val n = fn(spark, sf).count()
        if (n > 0) None else Some(s"$name: 0 rows")
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("s05_agg_global matches hand-computed values") {
    val row = SparkEntry.queries("s05_agg_global")(spark, sf).collect().head
    val qty = graft.model.Tables.lineitem(spark, sf)
      .select(org.apache.spark.sql.functions.col("l_quantity"))
      .collect().map(_.getDouble(0))
    assert(row.getAs[Long]("n") == qty.length)
    assert(row.getAs[Double]("min_qty") == qty.min)
    assert(row.getAs[Double]("max_qty") == qty.max)
    val sumBd = qty.map(BigDecimal(_).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(math.abs(row.getAs[Double]("sum_qty") - sumBd.toDouble) < 1e-9)
  }

  test("s13 hopping: every event lands in exactly 2 windows") {
    val n = graft.model.Tables.events(spark, sf).count()
    val hopped = SparkEntry.queries("s13_window_hopping")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n")).collect().head.getLong(0)
    assert(hopped == 2 * n)
  }
}

class RouterSpec extends AnyFunSuite {
  import graft.route.Router

  test("wildcard compilation") {
    assert(Router.wildcardToRegex("a.*") == "^a\\..*$")
    assert(Router.wildcardToRegex("*") == "^.*$")
    assert(Router.wildcardToRegex("kube.var.log[1]") == "^kube\\.var\\.log\\[1\\]$")
  }

  test("tag match semantics mirror flb_router_match") {
    import TestSpark._
    import spark.implicits._
    val df = Seq("app.error", "app.err.x", "db.error", "app").toDF("tag")
    def matched(p: String): Set[String] =
      df.filter(Router.tagMatch(org.apache.spark.sql.functions.col("tag"), p))
        .as[String].collect().toSet
    assert(matched("app.*") == Set("app.error", "app.err.x"))
    assert(matched("*") == Set("app.error", "app.err.x", "db.error", "app"))
    assert(matched("app") == Set("app"))
    assert(matched("/^app$/") == Set("app"))
  }
}
