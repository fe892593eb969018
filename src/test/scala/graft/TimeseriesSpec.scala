package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.obs.Timeseries

/** Hand-built fixtures for the series-resampling family (graft.obs
  * .Timeseries): the DuckDB hash gates prove the math at sf; these pin the
  * fill/interpolate/changepoint corner cases and the one-exchange plan.
  */
class TimeseriesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val B = 10L // tiny bucket for fixtures

  private def bk(rows: (String, Long, Long)*) =
    rows.toSeq.toDF("series", "bucket_us", "cents")
      .withColumn("n_samples", lit(1L))

  // --- gap fill (LOCF) ---------------------------------------------------

  test("gapFillLocf: gap buckets carry the last observed value") {
    val out = Timeseries.gapFillLocf(bk(("a", 0L, 7L), ("a", 40L, 9L)), B)
      .orderBy("bucket_us").collect()
    assert(out.map(_.getAs[Long]("bucket_us")).toSeq == Seq(0L, 10L, 20L, 30L, 40L))
    assert(out.map(_.getAs[Long]("cents")).toSeq == Seq(7L, 7L, 7L, 7L, 9L))
    assert(out.map(_.getAs[Long]("filled")).toSeq == Seq(0L, 1L, 1L, 1L, 0L))
    assert(out.filter(_.getAs[Long]("filled") == 1L)
      .forall(_.getAs[Long]("n_samples") == 0L))
  }

  test("gapFillLocf: adjacent buckets generate nothing; series are independent") {
    val out = Timeseries.gapFillLocf(
      bk(("a", 0L, 1L), ("a", 10L, 2L), ("b", 100L, 5L)), B).collect()
    assert(out.length == 3 && out.forall(_.getAs[Long]("filled") == 0L))
  }

  // --- linear interpolation ---------------------------------------------

  test("interpolate: milli-cent slope is exact, truncating like DuckDB //") {
    // 10 → 20 over 3 steps: 13333, 16666 (trunc), not 13334/16667
    val out = Timeseries.interpolate(bk(("a", 0L, 10L), ("a", 30L, 20L)), B)
      .orderBy("bucket_us").collect()
    assert(out.map(_.getAs[Long]("milli_cents")).toSeq ==
      Seq(10000L, 13333L, 16666L, 20000L))
  }

  test("interpolate: negative slope truncates toward zero on both engines") {
    // 0 → -10 over 3 steps: ((-10)*1000*1) div 3 = -3333 (toward zero)
    val out = Timeseries.interpolate(bk(("a", 0L, 0L), ("a", 30L, -10L)), B)
      .orderBy("bucket_us").collect()
    assert(out.map(_.getAs[Long]("milli_cents")).toSeq ==
      Seq(0L, -3333L, -6666L, -10000L))
  }

  // --- EWMA --------------------------------------------------------------

  test("ewma: fixed-point weights halve per lag, missing history is zero") {
    val out = Timeseries.ewma(bk(("a", 0L, 4L), ("a", 10L, 8L)))
      .orderBy("bucket_us").collect()
    assert(out(0).getAs[Long]("ewma_fp") == 4L * 32768L)
    assert(out(1).getAs[Long]("ewma_fp") == 8L * 32768L + 4L * 16384L)
  }

  // --- CUSUM -------------------------------------------------------------

  test("cusum: level shift peaks at the last pre-shift bucket") {
    val out = Timeseries.cusum(bk(
      ("a", 0L, 0L), ("a", 10L, 0L), ("a", 20L, 0L),
      ("a", 30L, 10L), ("a", 40L, 10L), ("a", 50L, 10L))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("change_bucket_us") == 20L)
    assert(out.head.getAs[Long]("cusum_peak") == 90L)
    assert(out.head.getAs[Long]("n_buckets") == 6L)
  }

  test("cusum: flat series peaks at zero, earliest bucket wins the tie") {
    val out = Timeseries.cusum(bk(("a", 0L, 5L), ("a", 10L, 5L))).collect()
    assert(out.head.getAs[Long]("cusum_peak") == 0L)
    assert(out.head.getAs[Long]("change_bucket_us") == 0L)
  }

  // --- sliding distinct --------------------------------------------------

  test("slidingDistinct: each event lands in `panes` windows, users dedupe") {
    // bucket(ts_ns) = ts_ns/1000/10; user 1 hits buckets 0 and 1,
    // user 2 hits bucket 0 only
    val df = Seq(("a", 0L, 1L), ("a", 10000L, 1L), ("a", 0L, 2L))
      .toDF("series", "ts_ns", "u")
    val out = Timeseries.slidingDistinct(df, $"series", $"ts_ns", $"u",
        bucketUs = 10L, panes = 3)
      .collect().map(r => r.getAs[Long]("win_start_us") ->
        r.getAs[Long]("n_users")).toMap
    assert(out == Map(-20L -> 2L, -10L -> 2L, 0L -> 2L, 10L -> 1L))
  }

  // --- OLS trend ---------------------------------------------------------

  test("trend: exact slope on a linear series, zero on flat, 0 when n=1") {
    val lin = Timeseries.trend(bk(("a", 0L, 10L), ("a", 10L, 20L),
      ("a", 20L, 30L), ("a", 30L, 40L))).collect().head
    assert(lin.getAs[Long]("num_ty") == 100L)
    assert(lin.getAs[Long]("den_tt") == 20L)
    assert(lin.getAs[Long]("slope_centi") == 1000L) // 10 cents/bucket

    val flat = Timeseries.trend(bk(("a", 0L, 7L), ("a", 10L, 7L)))
      .collect().head
    assert(flat.getAs[Long]("slope_centi") == 0L)

    val one = Timeseries.trend(bk(("a", 0L, 7L))).collect().head
    assert(one.getAs[Long]("den_tt") == 0L)
    assert(one.getAs[Long]("slope_centi") == 0L)
  }

  // --- latency bands / z-order -------------------------------------------

  test("groupedQuantiles2: exact lower quantiles per (series, bucket) cell") {
    val df = Seq(("a", 0L, 1L), ("a", 0L, 2L), ("a", 0L, 3L), ("a", 0L, 4L),
      ("a", 1L, 10L), ("b", 0L, 5L))
      .toDF("s", "b", "v")
    val out = graft.ops.Quantiles.groupedQuantiles2(df, $"s", $"b", $"v",
        Seq(("p50", 1, 2)))
      .collect().map(r => (r.getAs[String]("g1"), r.getAs[Long]("g2")) ->
        r.getAs[Long]("value")).toMap
    assert(out == Map(("a", 0L) -> 2L, ("a", 1L) -> 10L, ("b", 0L) -> 5L))
  }

  test("zorder gate: every curve cell bounds BOTH dimensions") {
    val rows = graft.queries.Registry.queries("x_layout_zorder")(spark, sf)
      .collect()
    assert(rows.length > 1, "the curve must spread into multiple cells")
    for (r <- rows) {
      // a 2^24 z-cell spans 2^12 in each interleaved dimension
      assert(r.getAs[Long]("tb_max") - r.getAs[Long]("tb_min") < 4096L)
      assert(r.getAs[Long]("cb_max") - r.getAs[Long]("cb_min") < 4096L)
    }
  }

  // --- plan shape --------------------------------------------------------

  test("cusum plans ONE exchange: both windows share the series partitioning") {
    val plan = Timeseries.cusum(bk(("a", 0L, 1L)))
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 1, s"expected 1 exchange, got $n:\n${plan.take(3000)}")
  }

  test("gapfill gap generation is map-side after the one window shuffle") {
    val plan = graft.queries.Registry.queries("x_series_gapfill")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "gap rows must be generated, not joined")
    // aggregate shuffle + window shuffle, nothing else
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n <= 2, s"expected ≤2 exchanges, got $n")
  }
}
