package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.Tda
import graft.queries.Registry

/** Known-answer fixtures for the clean-room persistence core (hand
  * computable point sets) plus the windowed Spark operator. The
  * reference semantics under test: Betti_k = finite VR persistence
  * bars of dim k with persistence ≥ 1e-3, filtration capped at the
  * quantile-chosen threshold (flb_ripser_wrapper.cpp:66-106,
  * tda.c:808-998).
  */
class TdaSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def distOf(pts: Array[Array[Double]]): Array[Array[Double]] = {
    val n = pts.length
    val d = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- 0 until n)
      d(i)(j) = math.sqrt(pts(i).zip(pts(j)).map { case (a, b) =>
        (a - b) * (a - b) }.sum)
    d
  }

  test("equilateral triangle: two merges, the cycle has zero persistence") {
    val d = distOf(Array(Array(0.0, 0.0), Array(1.0, 0.0),
      Array(0.5, math.sqrt(3) / 2)))
    // all three edges AND the filling triangle appear at diam 1 — the
    // 1-cycle is born and dies at the same scale (not counted)
    assert(Tda.bettiCounts(d, 1.5) == ((2, 0, 0)))
  }

  test("unit square: the 4-cycle persists from side 1 to diagonal sqrt2") {
    val d = distOf(Array(Array(0.0, 0.0), Array(1.0, 0.0),
      Array(1.0, 1.0), Array(0.0, 1.0)))
    // cap below the diagonal: the cycle never fills → infinite → skipped
    assert(Tda.bettiCounts(d, 1.2) == ((3, 0, 0)))
    // cap above: bar (1, sqrt2), persistence 0.414 — counted once (the
    // second diagonal's cycle is born and filled at sqrt2, zero persist)
    assert(Tda.bettiCounts(d, 1.5) == ((3, 1, 0)))
  }

  test("hollow octahedron: the 2-sphere persists from sqrt2 to 2") {
    val d = distOf(Array(
      Array(1.0, 0.0, 0.0), Array(-1.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0), Array(0.0, -1.0, 0.0),
      Array(0.0, 0.0, 1.0), Array(0.0, 0.0, -1.0)))
    // below 2 the antipodal edges are absent: 12 edges + 8 triangles at
    // sqrt2 form the hollow surface; its H2 class never dies → skipped
    assert(Tda.bettiCounts(d, 1.9) == ((5, 0, 0)))
    // at 2 the antipodal edges + interior simplices fill the sphere:
    // bar (sqrt2, 2) in dim 2; every 1-cycle is born and filled at
    // sqrt2 (zero persistence)
    assert(Tda.bettiCounts(d, 2.05) == ((5, 0, 1)))
  }

  test("two far clusters: merges stay within clusters below the gap") {
    val d = distOf(Array(Array(0.0), Array(0.5), Array(100.0), Array(100.5)))
    assert(Tda.bettiCounts(d, 1.0) == ((2, 0, 0)))  // 2 in-cluster merges
    assert(Tda.bettiCounts(d, 200.0)._1 == 3)       // bridged: 3 merges
  }

  test("threshold quantile: floor-index of the sorted pair distances") {
    val d = distOf(Array(Array(0.0), Array(1.0), Array(3.0)))
    // sorted pairs: 1, 2, 3 → q=0.5 → idx floor(0.5·2)=1 → 2.0
    assert(Tda.thresholdAtQuantile(d, 0.5) == 2.0)
    assert(Tda.thresholdAtQuantile(d, 0.0) == 1.0)
    assert(Tda.thresholdAtQuantile(d, 1.0) == 3.0)
  }

  test("delay embedding: m=2 tau=1 concatenates consecutive samples") {
    val s = Array(Array(0.0), Array(1.0), Array(3.0))
    val d = Tda.embedDistances(s, m = 2, tau = 1)
    // embedded points: (1,0) and (3,1) → distance sqrt(4+1)
    assert(d.length == 2)
    assert(math.abs(d(1)(0) - math.sqrt(5.0)) < 1e-12)
  }

  test("windowed operator: circle group shows a loop, line group does not") {
    val circle = (0 until 12).map { k =>
      val a = 2 * math.Pi * k / 12
      ("circle", k.toLong, math.cos(a), math.sin(a))
    }
    val line = (0 until 12).map(k => ("line", k.toLong, k / 4.0, 0.0))
    val df = (circle ++ line).toDF("g", "tn", "x", "y")
    val out = Tda.tdaWindows(df, col("g"), col("tn"),
        Seq(col("x"), col("y")), windowSize = 16, minPoints = 4)
      .collect().map(r => r.getString(0) ->
        (r.getInt(2), r.getInt(3))).toMap
    assert(out("circle")._2 >= 1, s"circle betti_1: ${out("circle")}")
    assert(out("line")._2 == 0, s"line betti_1: ${out("line")}")
    // the sweep prefers the loop-bearing scale (tda.c:945-990)
    assert(out("circle")._1 >= 1)
  }

  test("windowed betti operator: per-type windows produce bounded gauges") {
    import graft.model.Tables
    import graft.obs.Observability
    val rows = Tda.tdaWindows(Tables.events(spark, sf),
        col("event_type"), col("ts_ns"),
        Seq(Observability.cents(col("value")).cast("double")),
        windowSize = 60, embedDim = 3, embedDelay = 2)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[String]("series").nonEmpty)
      assert(r.getAs[Int]("n_embed") <= 60)
      assert(r.getAs[Int]("betti_0") >= 0 &&
        r.getAs[Int]("betti_0") < r.getAs[Int]("n_embed").max(1))
      assert(r.getAs[Long]("q_bp") >= 0L && r.getAs[Long]("q_bp") <= 9000L)
      // 60-sample windows embed to 56 points > the dim-2 cap: every full
      // window must carry the honest flag
      if (r.getAs[Int]("n_embed") > 32) {
        assert(r.getAs[Boolean]("b2_capped"))
        assert(r.getAs[Int]("betti_2") == 0)
      }
    }
  }

  test("threshold gate: squared quantiles agree with the double-space sweep") {
    // one series, single feature, m=1 (identity embedding): the gate's
    // integer d2 quantiles must be the square of thresholdAtQuantile
    val vals = Seq(0L, 1L, 3L, 7L, 15L, 31L)
    val df = vals.zipWithIndex
      .map { case (v, i) => ("s", i.toLong, v) }.toDF("g", "tn", "v")
    val out = Tda.tdaThresholds(df, col("g"), col("tn"), col("v"),
        windowSize = 16, embedDim = 1, embedDelay = 1)
      .collect().head
    assert(out.getAs[Long]("n_embed") == 6L)
    assert(out.getAs[Long]("n_pairs") == 15L)
    val pts = vals.map(v => Array(v.toDouble)).toArray
    val dist = Array.tabulate(pts.length, pts.length) { (i, j) =>
      math.abs(pts(i)(0) - pts(j)(0)) }
    for ((q, cname) <- Seq(0.10 -> "d2_q10", 0.50 -> "d2_q50",
        0.90 -> "d2_q90")) {
      val t = Tda.thresholdAtQuantile(dist, q)
      assert(out.getAs[Long](cname) == math.round(t * t),
        s"$cname: ${out.getAs[Long](cname)} vs ${t * t}")
    }
  }

  test("threshold gate smoke: integer-exact rows at the events scale") {
    val rows = Registry.queries("x_tda_threshold")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val ne = r.getAs[Long]("n_embed")
      assert(ne >= 2L && ne <= 56L)
      assert(r.getAs[Long]("n_pairs") == ne * (ne - 1) / 2)
      assert(r.getAs[Long]("d2_q10") <= r.getAs[Long]("d2_q50"))
      assert(r.getAs[Long]("d2_q50") <= r.getAs[Long]("d2_q90"))
    }
  }
}
