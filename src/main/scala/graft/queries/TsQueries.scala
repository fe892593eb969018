package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.obs.{Observability, Timeseries}

/** Time-series resampling gates: the events stream bucketed onto a 10-min
  * grid, then gap-filled (LOCF), linearly interpolated, EWMA-smoothed,
  * CUSUM change-pointed, and seasonally profiled — the fill/smooth layer a
  * TSDB runs downstream of the shipper's windowed aggregates
  * (reference src/stream_processor/flb_sp_window.c stops at the window).
  * All integer-exact; every gate hash-matches a DuckDB replay.
  */
object TsQueries {

  private[queries] val B = 600000000L // 10-min bucket, microseconds

  private[queries] def buckets(s: org.apache.spark.sql.SparkSession, dir: String) =
    Timeseries.bucketize(
      Tables.events(s, dir).withColumn("cents",
        Observability.cents(col("value"))),
      col("event_type"), col("ts_ns"), col("cents"), B)

  /** Shared oracle prelude: observed (series, bucket) sums. */
  private[queries] val O =
    s"""WITH s AS (SELECT event_type, epoch_ns(ts) AS ts_ns,
                    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                      AS cents
                  FROM events),
             o AS (SELECT event_type AS series,
                     (ts_ns // 1000 // $B) * $B AS bucket_us,
                     CAST(sum(cents) AS BIGINT) AS cents,
                     CAST(count(*) AS BIGINT) AS n_samples
                   FROM s GROUP BY 1, 2)"""

  /** Lagged prelude: each observed bucket with its predecessor. */
  private[queries] val P = O +
    s""",
             p AS (SELECT series, bucket_us, cents, n_samples,
                     lag(bucket_us) OVER w AS prev_b,
                     lag(cents) OVER w AS prev_c
                   FROM o
                   WINDOW w AS (PARTITION BY series ORDER BY bucket_us))"""

  def all: Seq[GraftQuery] = Seq(

    // Gap fill + LOCF: gap rows are generated map-side from each observed
    // row's lag() neighbor (sequence+explode) — no dense-calendar cross
    // join, so only observed buckets ever shuffle.
    GraftQuery(
      "x_series_gapfill",
      (s, dir) => Timeseries.gapFillLocf(buckets(s, dir), B),
      Some(P + s""",
             g AS (SELECT series,
                     unnest(generate_series(prev_b + $B, bucket_us - $B,
                       $B)) AS bucket_us,
                     prev_c AS cents, CAST(0 AS BIGINT) AS n_samples,
                     CAST(1 AS BIGINT) AS filled
                   FROM p
                   WHERE prev_b IS NOT NULL AND bucket_us - prev_b > $B)
             SELECT series, bucket_us, cents, n_samples,
                    CAST(0 AS BIGINT) AS filled
             FROM o
             UNION ALL
             SELECT series, bucket_us, cents, n_samples, filled FROM g""")
    ),

    // Linear interpolation in milli-cents: the slope term is exact
    // integer math (truncating div on both engines), negative slopes
    // included.
    GraftQuery(
      "x_series_interpolate",
      (s, dir) => Timeseries.interpolate(buckets(s, dir), B),
      Some(P + s""",
             g AS (SELECT series, prev_b, prev_c, cents,
                     (bucket_us - prev_b) // $B AS total_steps,
                     unnest(generate_series(1,
                       (bucket_us - prev_b) // $B - 1, 1)) AS k
                   FROM p
                   WHERE prev_b IS NOT NULL AND bucket_us - prev_b > $B)
             SELECT series, bucket_us, cents * 1000 AS milli_cents,
                    CAST(0 AS BIGINT) AS filled
             FROM o
             UNION ALL
             SELECT series, prev_b + k * $B AS bucket_us,
                    prev_c * 1000 +
                      ((cents - prev_c) * 1000 * k) // total_steps
                      AS milli_cents,
                    CAST(1 AS BIGINT) AS filled
             FROM g""")
    ),

    // EWMA α=1/2 truncated at 16 lags as an exact ×2^16 fixed-point sum;
    // missing history contributes weight-0 terms.
    GraftQuery(
      "x_series_ewma",
      (s, dir) => Timeseries.ewma(buckets(s, dir)),
      Some {
        val terms = (0 until 16).map { k =>
          val wgt = 1L << (15 - k)
          if (k == 0) s"cents * $wgt"
          else s"coalesce(lag(cents, $k) OVER w, 0) * $wgt"
        }.mkString(" + ")
        O + s"""
             SELECT series, bucket_us, cents,
                    CAST($terms AS BIGINT) AS ewma_fp
             FROM o
             WINDOW w AS (PARTITION BY series ORDER BY bucket_us)"""
      }
    ),

    // CUSUM changepoint: argmax |n·run_k − k·total| per series (scaled
    // exact CUSUM, cross-multiplied mean), earliest bucket wins ties.
    GraftQuery(
      "x_series_cusum",
      (s, dir) => Timeseries.cusum(buckets(s, dir)),
      Some(O + """,
             c AS (SELECT series, bucket_us,
                     CAST(row_number() OVER w AS BIGINT) AS k,
                     sum(cents) OVER (PARTITION BY series ORDER BY
                       bucket_us ROWS UNBOUNDED PRECEDING) AS run,
                     CAST(count(*) OVER (PARTITION BY series) AS BIGINT)
                       AS n,
                     sum(cents) OVER (PARTITION BY series) AS total
                   FROM o
                   WINDOW w AS (PARTITION BY series ORDER BY bucket_us)),
             a AS (SELECT series, bucket_us, n,
                     abs(n * run - k * total) AS abs_cs
                   FROM c),
             r AS (SELECT series, bucket_us, abs_cs, n,
                     row_number() OVER (PARTITION BY series
                       ORDER BY abs_cs DESC, bucket_us) AS rk
                   FROM a)
             SELECT series, bucket_us AS change_bucket_us,
                    CAST(abs_cs AS BIGINT) AS cusum_peak, n AS n_buckets
             FROM r WHERE rk = 1""")
    ),

    // Sliding (hopping) exact distinct users: 30-min window hopping by
    // 10 min — each event explodes into its 3 windows map-side, then one
    // (series, window, user) partial-distinct aggregate.
    GraftQuery(
      "x_obs_sliding_distinct",
      (s, dir) =>
        Timeseries.slidingDistinct(Tables.events(s, dir),
          col("event_type"), col("ts_ns"), col("user_id"), B, panes = 3),
      Some(s"""WITH s AS (SELECT event_type AS series, epoch_ns(ts)
                      AS ts_ns, user_id
                    FROM events),
             w AS (SELECT series, user_id,
                     unnest(generate_series(ts_ns // 1000 // $B - 2,
                       ts_ns // 1000 // $B, 1)) AS w
                   FROM s),
             d AS (SELECT DISTINCT series, w * $B AS win_start_us,
                     user_id
                   FROM w)
             SELECT series, win_start_us,
                    CAST(count(*) AS BIGINT) AS n_users
             FROM d GROUP BY 1, 2""")
    ),

    // Per-series OLS trend: centered-time slope as exact integers
    // (Σt' = 0 kills the cross term), centi-cents per bucket.
    GraftQuery(
      "x_series_trend",
      (s, dir) => Timeseries.trend(buckets(s, dir)),
      Some(O + """,
             r AS (SELECT series, cents,
                     CAST(row_number() OVER (PARTITION BY series
                       ORDER BY bucket_us) AS BIGINT) AS k
                   FROM o),
             a AS (SELECT series, CAST(count(*) AS BIGINT) AS n_buckets,
                     CAST(sum(cents) AS BIGINT) AS sum_y,
                     CAST(sum(2 * k * cents) AS BIGINT) AS sum_2ky,
                     CAST(sum(k * k) AS BIGINT) AS sum_kk
                   FROM r GROUP BY 1),
             b AS (SELECT series, n_buckets,
                     sum_2ky - (n_buckets + 1) * sum_y AS num_ty,
                     4 * sum_kk -
                       (n_buckets + 1) * (n_buckets + 1) * n_buckets
                       AS den_tt
                   FROM a)
             SELECT series, n_buckets, num_ty, den_tt,
                    CAST(CASE WHEN den_tt = 0 THEN 0
                      ELSE (200 * num_ty) // den_tt END AS BIGINT)
                      AS slope_centi
             FROM b""")
    ),

    // Hour-of-day (UTC) seasonal profile: a 24·|series|-row aggregate
    // whatever the input size (map-side partials).
    GraftQuery(
      "x_series_seasonal",
      (s, dir) =>
        Timeseries.seasonalProfile(
          Tables.events(s, dir).withColumn("cents",
            Observability.cents(col("value"))),
          col("event_type"), col("ts_ns"), col("cents")),
      Some("""WITH s AS (SELECT event_type AS series,
                     (epoch_ns(ts) // 3600000000000) % 24 AS hod,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents
                   FROM events)
             SELECT series, hod, CAST(count(*) AS BIGINT) AS n_events,
                    CAST(sum(cents) AS BIGINT) AS sum_cents,
                    CAST((sum(cents) * 1000) // count(*) AS BIGINT)
                      AS mean_milli
             FROM s GROUP BY 1, 2""")
    ),

    // Autocorrelation (ACF lags 1–3) per series: Pearson r between the
    // series and its k-step lead over the (ts, id)-ordered sequence —
    // the seasonality/memory detector an anomaly pipeline runs before
    // picking window sizes. All moment sums are exact integers
    // (DECIMAL(38,0) — n·Σx² overflows BIGINT at corpus scale) and the
    // only floating-point steps are one cast, two correctly-rounded
    // sqrts, and one IEEE multiply+divide on identical operands, so the
    // doubles hash-match DuckDB bit-for-bit. Scale shape: the lead()
    // windows partition by series key (real deployments have hosts ×
    // metrics of them, far more than cores) and the moment aggregate is
    // one map-side-combined pass; 3 rows out per series.
    GraftQuery(
      "x_series_acf",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("ts_ns"), col("event_id"))
        val led = Tables.events(s, dir)
          .select(col("event_type"), col("ts_ns"), col("event_id"),
            Observability.cents(col("value")).as("x"))
          .select(col("event_type"), col("x"),
            lead(col("x"), 1).over(w).as("x1"),
            lead(col("x"), 2).over(w).as("x2"),
            lead(col("x"), 3).over(w).as("x3"))
        val d = "decimal(38,0)"
        val agg = led
          .select(col("event_type"), expr("stack(3, " +
            "CAST(1 AS BIGINT), x, x1, " +
            "CAST(2 AS BIGINT), x, x2, " +
            "CAST(3 AS BIGINT), x, x3) AS (lag, xv, yv)"))
          .filter(col("yv").isNotNull)
          .groupBy(col("event_type"), col("lag"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("xv").cast(d)).as("sx"),
            sum(col("yv").cast(d)).as("sy"),
            sum((col("xv") * col("yv")).cast(d)).as("sxy"),
            sum((col("xv") * col("xv")).cast(d)).as("sxx"),
            sum((col("yv") * col("yv")).cast(d)).as("syy"))
        agg.select(col("event_type"), col("lag"), col("n_pairs"),
          ((col("n_pairs").cast(d) * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (sqrt((col("n_pairs").cast(d) * col("sxx") -
              col("sx") * col("sx")).cast("double")) *
             sqrt((col("n_pairs").cast(d) * col("syy") -
               col("sy") * col("sy")).cast("double")))).as("acf"))
      },
      Some("""WITH e AS (SELECT event_type, epoch_ns(ts) AS ts_ns, event_id,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS x
                   FROM events),
             led AS (SELECT event_type, x,
                       lead(x, 1) OVER w AS x1,
                       lead(x, 2) OVER w AS x2,
                       lead(x, 3) OVER w AS x3
                     FROM e WINDOW w AS (PARTITION BY event_type
                       ORDER BY ts_ns, event_id)),
             st AS (SELECT event_type, lag, xv, yv FROM (
                      SELECT event_type, CAST(1 AS BIGINT) AS lag,
                             x AS xv, x1 AS yv FROM led
                      UNION ALL SELECT event_type, 2, x, x2 FROM led
                      UNION ALL SELECT event_type, 3, x, x3 FROM led)
                    WHERE yv IS NOT NULL),
             agg AS (SELECT event_type, lag,
                       CAST(count(*) AS BIGINT) AS n_pairs,
                       sum(CAST(xv AS HUGEINT)) AS sx,
                       sum(CAST(yv AS HUGEINT)) AS sy,
                       sum(CAST(xv AS HUGEINT) * yv) AS sxy,
                       sum(CAST(xv AS HUGEINT) * xv) AS sxx,
                       sum(CAST(yv AS HUGEINT) * yv) AS syy
                     FROM st GROUP BY 1, 2)
             SELECT event_type, lag, n_pairs,
                    CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
                      (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)) *
                       sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)))
                      AS acf
             FROM agg""")
    )
  )
}
