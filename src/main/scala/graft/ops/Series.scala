package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** processor_cumulative_to_delta (reference
  * `plugins/processor_cumulative_to_delta/cumulative_to_delta.c:109-170`):
  * convert monotonic cumulative counters to deltas, per series, with
  * counter-reset detection (delta < 0 ⇒ emit the raw value).
  *
  * Spark mapping: `value - lag(value) over (partitionBy(series) orderBy
  * ts)`. The shuffle partitions by series key — at 100 TB this is the
  * natural distribution (series count >> executors); no global sort.
  */
object CumulativeToDelta {
  def apply(df: DataFrame, seriesCols: Seq[Column], orderCols: Seq[Column],
            valueCol: Column, outName: String): DataFrame = {
    val w = Window.partitionBy(seriesCols: _*).orderBy(orderCols: _*)
    val prev = lag(valueCol, 1).over(w)
    val delta = valueCol - prev
    df.withColumn(outName,
      when(prev.isNull, lit(null))              // first point: no delta
        .when(delta < 0, valueCol)              // reset detected
        .otherwise(delta))
  }
}

/** filter_throttle (reference `plugins/filter_throttle/throttle.c:190`,
  * pane table window.c:58-105): token-rate limit — keep at most
  * `rate × windowPanes` records per key per pane window.
  *
  * Batch approximation (SURVEY §2.3): rank records within each
  * (key, pane) by a total order and keep the first `rate`. The streaming
  * twin (token bucket in flatMapGroupsWithState) lives in
  * graft.streaming.
  */
object Throttle {
  def apply(df: DataFrame, keyCols: Seq[Column], tsSecCol: Column,
            orderCols: Seq[Column], paneSeconds: Long, rate: Int): DataFrame = {
    val pane = (tsSecCol / paneSeconds).cast("long")
    val w = Window.partitionBy((keyCols :+ pane): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= rate)
      .drop("__rn")
  }
}

/** processor_sampling, probabilistic mode (reference
  * `plugins/processor_sampling/sampling.h:27-31`): keep a percentage of
  * traces. Deterministic variant: hash the trace/record id instead of
  * rand() so reruns (and the DuckDB oracle) agree — md5 is available and
  * bit-identical in both engines.
  */
object Sampling {
  /** Keep ~`percent`% of rows, decided by the first 4 hex digits of
    * md5(key): 16^4 buckets. Lexicographic compare on the fixed-width
    * lowercase hex prefix ≡ numeric compare, and is portable SQL.
    */
  def probabilistic(df: DataFrame, key: Column, percent: Double): DataFrame = {
    val threshold = f"${(percent / 100.0 * 65536).toLong}%04x"
    df.filter(substring(md5(key.cast("string")), 1, 4) < lit(threshold))
  }
}

/** filter_log_to_metrics (reference `plugins/filter_log_to_metrics/
  * log_to_metrics.c:970`, modes log_to_metrics.h:44-46): regex-match log
  * records and emit counter / gauge / histogram metrics, with labels from
  * record-accessor paths.
  */
object LogToMetrics {
  /** mode=counter: count matching records per label set. */
  def counter(df: DataFrame, matchCond: Column, labels: Seq[Column], name: String): DataFrame =
    df.filter(matchCond).groupBy(labels: _*)
      .agg(count(lit(1)).as("value"))
      .withColumn("metric_name", lit(name))
      .withColumn("metric_type", lit("counter"))

  /** mode=gauge: last value per label set needs an order; batch variant
    * uses max as the deterministic stand-in the reference's tests use.
    */
  def gauge(df: DataFrame, matchCond: Column, valueCol: Column,
            labels: Seq[Column], name: String): DataFrame =
    df.filter(matchCond).groupBy(labels: _*)
      .agg(max(valueCol).as("value"))
      .withColumn("metric_name", lit(name))
      .withColumn("metric_type", lit("gauge"))

  /** mode=histogram: fixed bucket upper bounds (defaults mirror
    * log_to_metrics.h) — emits one row per (labels, bucket) in long
    * format plus +Inf, sum and count rows, cmetrics-style.
    */
  def histogram(df: DataFrame, matchCond: Column, valueCol: Column,
                labels: Seq[Column], name: String,
                buckets: Seq[Double]): DataFrame = {
    val matched = df.filter(matchCond)
    val bucketExprs = buckets.map(b =>
      sum(when(valueCol <= b, 1L).otherwise(0L)).as(s"le_$b"))
    val aggd = matched.groupBy(labels: _*)
      .agg(bucketExprs.head, (bucketExprs.tail :+
        count(lit(1)).as("le_inf") :+
        sum(valueCol.cast("decimal(18,2)")).cast("double").as("value_sum")): _*)
    aggd.withColumn("metric_name", lit(name))
      .withColumn("metric_type", lit("histogram"))
  }
}

/** Time-series OHLC downsampling — the TSDB rollup shape (a raw metric
  * stream compacts to per-bucket open/high/low/close/sum rows before
  * long-term storage; every metrics backend the reference exports to
  * stores rollups of this form). One epoch-aligned `window()` aggregate
  * per (series, bucket): partial min/max/min_by/max_by combine
  * map-side, so the shuffle carries one partial row per (series,
  * bucket, partition) regardless of raw point volume.
  *
  * First/last points are selected by `min_by`/`max_by` over a
  * zero-padded (ts, id) string key — total order even under timestamp
  * collisions, replayable as DuckDB's `arg_min/arg_max(v, VARCHAR)`.
  * The sum folds in DECIMAL so the result is addition-order-free.
  */
object OhlcDownsample {
  import org.apache.spark.sql.functions._

  def apply(df: DataFrame, key: Column, tsCol: Column,
            idCol: Column, valueCol: Column,
            bucket: String = "1 minute"): DataFrame = {
    // micro precision on both sides: DuckDB reads TIMESTAMP(NANOS)
    // truncated to micros, so a nano-precision key would order
    // micro-tied points differently in the two engines. A STRUCT key
    // ((ts, id) lexicographic) selects identically to the oracle's
    // zero-padded string while allocating nothing per row.
    val ord = struct(unix_micros(tsCol).as("t"), idCol.as("i"))
    df.groupBy(key.as("k"), window(tsCol, bucket).as("w"))
      .agg(
        min_by(valueCol, ord).as("open"),
        max(valueCol).as("high"),
        min(valueCol).as("low"),
        max_by(valueCol, ord).as("close"),
        count(lit(1)).as("n_points"),
        sum(valueCol.cast("decimal(28,6)")).cast("double").as("value_sum"))
      .select(col("k"), unix_micros(col("w.start")).as("bucket_us"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_points"), col("value_sum"))
  }
}
