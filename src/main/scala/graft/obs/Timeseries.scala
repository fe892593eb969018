package graft.obs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TSDB-style series resampling: regularize an irregular event stream onto
  * a fixed bucket grid, then fill the holes — carry-forward (LOCF), linear
  * interpolation, EWMA smoothing, CUSUM level-shift detection, and an
  * hour-of-day seasonal profile. The reference's stream processor exposes
  * only windowed aggregates (src/stream_processor/flb_sp_window.c); the
  * fill/smooth/changepoint layer is what its users run downstream in a
  * TSDB, answered here by the engine itself.
  *
  * Scale notes, which are the point of the designs below:
  *   - gap rows are GENERATED from each observed row's lag() neighbor with
  *     `sequence()` + `explode` — a map-side expansion after the one
  *     per-series window shuffle. No dense-calendar build, no grid join:
  *     the classic "cross join a generated calendar" plan shuffles the
  *     whole grid; this one shuffles only observed buckets.
  *   - everything is integer-exact (cents, fixed-point weights, truncating
  *     div — Spark `div` and DuckDB `//` both truncate toward zero), so
  *     every gate hash-matches a DuckDB replay bit-for-bit.
  *   - per-series state never crosses the driver; a series is one window
  *     partition, and 100 TB of series parallelize across executors.
  */
object Timeseries {

  /** Sum `cents` per (series, bucket): the resample grid's observed rows.
    * One shuffle, map-side partial combine.
    */
  def bucketize(df: DataFrame, series: Column, tsNs: Column, cents: Column,
                bucketUs: Long): DataFrame =
    df.select(series.as("series"), tsNs.as("ts_ns"), cents.as("cents"))
      .withColumn("bucket_us",
        expr(s"(ts_ns div 1000 div $bucketUs) * $bucketUs"))
      .groupBy(col("series"), col("bucket_us"))
      .agg(sum(col("cents")).as("cents"), count(lit(1)).as("n_samples"))

  private def withPrev(buckets: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("series")).orderBy(col("bucket_us"))
    buckets
      .withColumn("prev_b", lag(col("bucket_us"), 1).over(w))
      .withColumn("prev_c", lag(col("cents"), 1).over(w))
  }

  /** Dense grid with gap buckets carried forward from the last observed
    * value (LOCF). `filled` marks generated rows; `n_samples` = 0 there.
    *
    * Each observed row emits ITSELF plus its preceding gap rows from one
    * exploded step-index `sequence` — a union of an "observed" branch with
    * a "gaps" branch would plan the aggregate subtree twice (Catalyst does
    * not share common subtrees across union arms), i.e. two input scans;
    * this shape is one scan, one agg exchange, one window exchange.
    */
  def gapFillLocf(buckets: DataFrame, bucketUs: Long): DataFrame = {
    val atObs = col("k") === 0L || col("k") === col("steps")
    withPrev(buckets)
      .withColumn("steps", expr(s"(bucket_us - prev_b) div $bucketUs"))
      .select(col("series"), col("prev_b"), col("prev_c"), col("cents"),
        col("n_samples"), col("bucket_us").as("ob"), col("steps"),
        explode(when(col("prev_b").isNull, array(lit(0L)))
          .otherwise(sequence(lit(1L), col("steps"), lit(1L)))).as("k"))
      .select(col("series"),
        when(col("k") === 0L, col("ob"))
          .otherwise(col("prev_b") + col("k") * bucketUs).as("bucket_us"),
        when(atObs, col("cents")).otherwise(col("prev_c")).as("cents"),
        when(atObs, col("n_samples")).otherwise(lit(0L)).as("n_samples"),
        when(atObs, lit(0L)).otherwise(lit(1L)).as("filled"))
  }

  /** Dense grid with gap buckets linearly interpolated between the two
    * surrounding observed values, in milli-cents (×1000 fixed point so
    * the slope survives integer math). Truncating division matches
    * DuckDB's `//` exactly, negative slopes included.
    */
  def interpolate(buckets: DataFrame, bucketUs: Long): DataFrame = {
    val atObs = col("k") === 0L || col("k") === col("steps")
    withPrev(buckets)
      .withColumn("steps", expr(s"(bucket_us - prev_b) div $bucketUs"))
      .select(col("series"), col("prev_b"), col("prev_c"), col("cents"),
        col("bucket_us").as("ob"), col("steps"),
        explode(when(col("prev_b").isNull, array(lit(0L)))
          .otherwise(sequence(lit(1L), col("steps"), lit(1L)))).as("k"))
      .select(col("series"),
        when(col("k") === 0L, col("ob"))
          .otherwise(col("prev_b") + col("k") * bucketUs).as("bucket_us"),
        when(atObs, col("cents") * 1000L)
          .otherwise(col("prev_c") * 1000L +
            expr("((cents - prev_c) * 1000 * k) div steps"))
          .as("milli_cents"),
        when(atObs, lit(0L)).otherwise(lit(1L)).as("filled"))
  }

  /** EWMA with α = 1/2 truncated at 16 lags, as an exact fixed-point sum:
    * ewma_fp = Σ_{k=0..15} coalesce(lag(cents,k),0) · 2^(15−k), i.e. the
    * smoothed value scaled by 2^16 (missing history contributes 0). A lag
    * chain instead of a frame aggregate because the weight depends on the
    * row's distance from the frame head, which no frame-agg can see; 16
    * lags over one per-series window is a single shuffle either way.
    */
  def ewma(buckets: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("series")).orderBy(col("bucket_us"))
    val terms = (0 until 16).map { k =>
      val v = if (k == 0) col("cents")
        else coalesce(lag(col("cents"), k).over(w), lit(0L))
      v * (1L << (15 - k))
    }
    buckets.select(col("series"), col("bucket_us"), col("cents"))
      .withColumn("ewma_fp", terms.reduce(_ + _))
  }

  /** CUSUM level-shift detection per series: the bucket where the running
    * deviation from the series mean peaks. Scaled exact form
    * cs_k = n·Σ_{i≤k}v_i − k·Σv (cross-multiplied mean, no division);
    * the reported changepoint is argmax |cs_k| with the earliest bucket
    * winning ties. Two windows over ONE per-series partitioning — Catalyst
    * plans a single exchange.
    */
  def cusum(buckets: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("series")).orderBy(col("bucket_us"))
    val wAll = Window.partitionBy(col("series"))
    val scored = buckets
      .select(col("series"), col("bucket_us"), col("cents"))
      .withColumn("k", row_number().over(wOrd).cast("long"))
      .withColumn("run", sum(col("cents")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("cents")).over(wAll))
      .withColumn("cs", col("n") * col("run") - col("k") * col("total"))
      .withColumn("abs_cs", abs(col("cs")))
    scored
      .withColumn("rk", row_number().over(Window.partitionBy(col("series"))
        .orderBy(col("abs_cs").desc, col("bucket_us"))))
      .filter(col("rk") === 1)
      .select(col("series"), col("bucket_us").as("change_bucket_us"),
        col("abs_cs").as("cusum_peak"), col("n").as("n_buckets"))
  }

  /** Hopping-window distinct users per series: each event lands in
    * `panes` consecutive windows (explode of the window-start sequence —
    * map-side ×panes expansion), then ONE (series, window, user)
    * partial-distinct aggregate and a count. Exact sliding distinct at
    * any scale: the shuffle carries (series, window, user) triples,
    * already deduped map-side, never raw events.
    */
  def slidingDistinct(df: DataFrame, series: Column, tsNs: Column,
                      user: Column, bucketUs: Long,
                      panes: Int): DataFrame =
    df.select(series.as("series"), tsNs.as("ts_ns"), user.as("u"))
      .withColumn("b", expr(s"ts_ns div 1000 div $bucketUs"))
      .select(col("series"), col("u"),
        explode(sequence(col("b") - (panes - 1), col("b"), lit(1L)))
          .as("w"))
      .select(col("series"), (col("w") * bucketUs).as("win_start_us"),
        col("u"))
      .distinct()
      .groupBy(col("series"), col("win_start_us"))
      .agg(count(lit(1)).as("n_users"))

  /** Per-series OLS trend over the bucket sequence, exact integers.
    * Centered time t' = 2k − n − 1 (k = 1-based bucket rank) makes
    * Σt' = 0, so slope = 2·Σt'y / Σt'² in cents-per-bucket; reported in
    * centi-cents per bucket via truncating div. One series-keyed
    * exchange: the rank window and the aggregate share the partitioning.
    */
  def trend(buckets: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("series")).orderBy(col("bucket_us"))
    buckets
      .select(col("series"), col("bucket_us"), col("cents"))
      .withColumn("k", row_number().over(wOrd).cast("long"))
      .groupBy(col("series"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("cents")).as("sum_y"),
        sum((lit(2L) * col("k")) * col("cents")).as("sum_2ky"),
        sum(col("k")).as("sum_k"), sum(col("k") * col("k")).as("sum_kk"))
      .select(col("series"), col("n_buckets"),
        // Σt'y = Σ(2k−n−1)y = Σ2ky − (n+1)Σy ; Σt'² = 4Σk² − (n+1)²n
        (col("sum_2ky") - (col("n_buckets") + 1L) * col("sum_y"))
          .as("num_ty"),
        (lit(4L) * col("sum_kk") -
          (col("n_buckets") + 1L) * (col("n_buckets") + 1L) *
            col("n_buckets")).as("den_tt"))
      .withColumn("slope_centi",
        when(col("den_tt") === 0L, lit(0L))
          .otherwise(expr("(200 * num_ty) div den_tt")))
  }

  /** Hour-of-day (UTC) seasonal profile per series: exact event count,
    * cents sum, and the milli-cent mean. Plain two-key aggregate —
    * map-side partials make this a 24·|series|-row shuffle regardless of
    * input size.
    */
  def seasonalProfile(df: DataFrame, series: Column, tsNs: Column,
                      cents: Column): DataFrame =
    df.select(series.as("series"), tsNs.as("ts_ns"), cents.as("cents"))
      .withColumn("hod", expr("(ts_ns div 3600000000000) % 24"))
      .groupBy(col("series"), col("hod"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
      .withColumn("mean_milli", expr("(sum_cents * 1000) div n_events"))
}
