package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.obs.Observability

/** Observability-analytics gates: the queries a fluent-bit user runs
  * DOWNSTREAM of the shipper (PromQL counter math, histogram quantiles,
  * log template mining, trace service graphs, SRE burn-rate alerts,
  * product funnels/retention, robust outliers) answered by the engine
  * itself. All integer-exact; every gate hash-matches a DuckDB replay.
  */
object ObsQueries {

  private[queries] def eventsWithCents(s: org.apache.spark.sql.SparkSession,
                              dir: String) =
    Tables.events(s, dir)
      .withColumn("cents", Observability.cents(col("value")))

  /** Shared oracle prelude: events with exact integer cents + ns time. */
  private[queries] val S =
    """WITH s AS (SELECT event_type, event_id, user_id, ts, props,
                   epoch_ns(ts) AS ts_ns,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                 FROM events)"""

  def all: Seq[GraftQuery] = Seq(

    // PromQL rate()/increase() with counter-reset handling. The counter
    // is synthesized as a running sum mod 1e6 cents — the modulo plants
    // genuine resets for the reset rule (delta<0 ⇒ counter restarted,
    // contribute the post-reset value) to handle; reference counters come
    // from plugins/filter_log_to_metrics (cmt_counter) and
    // processor cumulative_to_delta ships the same delta semantics.
    GraftQuery(
      "x_obs_rate",
      (s, dir) => {
        val wCum = Window.partitionBy(col("series"))
          .orderBy(col("ts_ns"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val samples = eventsWithCents(s, dir)
          .select(col("event_type").as("series"), col("ts_ns"),
            col("event_id"), col("cents"))
          .withColumn("counter", sum(col("cents")).over(wCum) % 1000000L)
        Observability.counterRate(samples, col("series"), col("ts_ns"),
          col("event_id"), col("counter"), bucketUs = 600000000L)
      },
      Some(S + """,
             c AS (SELECT event_type AS series, ts_ns, event_id,
                     CAST(sum(cents) OVER (PARTITION BY event_type
                       ORDER BY ts_ns, event_id ROWS UNBOUNDED PRECEDING)
                       % 1000000 AS BIGINT) AS counter
                   FROM s),
             d AS (SELECT series, ts_ns, counter,
                     lag(counter) OVER (PARTITION BY series
                       ORDER BY ts_ns, event_id) AS prev
                   FROM c)
             SELECT series,
                    (ts_ns // 1000 // 600000000) * 600000000 AS bucket_us,
                    CAST(sum(CASE WHEN prev IS NULL THEN 0
                             WHEN counter < prev THEN counter
                             ELSE counter - prev END) AS BIGINT)
                      AS increase_cents,
                    CAST(count(*) AS BIGINT) AS n_samples,
                    CAST(sum(CASE WHEN prev IS NULL THEN 0
                             WHEN counter < prev THEN counter
                             ELSE counter - prev END) AS DOUBLE) / 60000.0
                      AS rate_per_sec
             FROM d GROUP BY 1, 2""")
    ),

    // HDR-histogram quantiles: base-2 buckets with 16 sub-buckets per
    // octave (bitlen via the binary-format length — exact in both
    // engines), exact-rank select over the compacted histogram.
    GraftQuery(
      "x_obs_hdr_quantiles",
      (s, dir) =>
        Observability.hdrQuantiles(eventsWithCents(s, dir),
          col("event_type"), col("cents")),
      Some("""WITH s AS (SELECT event_type AS series,
                     greatest(CAST(CAST(value AS DECIMAL(18,2)) * 100
                       AS BIGINT), 0) AS v
                   FROM events),
             b AS (SELECT series, v,
                     greatest(length(format('{:b}', v)) - 5, 0) AS sh
                   FROM s),
             l AS (SELECT series, CAST((v >> sh) << sh AS BIGINT) AS lo
                   FROM b),
             c AS (SELECT series, lo, CAST(count(*) AS BIGINT) AS cnt
                   FROM l GROUP BY 1, 2),
             cc AS (SELECT series, lo,
                      sum(cnt) OVER (PARTITION BY series ORDER BY lo
                        ROWS UNBOUNDED PRECEDING) AS cum,
                      sum(cnt) OVER (PARTITION BY series) AS total
                    FROM c),
             q AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10),
                     ('p99', 99, 100)) AS t(q, num, den)),
             j AS (SELECT cc.series, q.q,
                     (cc.total * q.num + q.den - 1) // q.den AS needed,
                     cc.lo, cc.cum
                   FROM cc, q)
             SELECT series, q, CAST(min(needed) AS BIGINT) AS rank_needed,
                    CAST(min(lo) AS BIGINT) AS bucket_lo
             FROM j WHERE cum >= needed GROUP BY 1, 2""")
    ),

    // Drain-style template mining over synthesized log lines (the line
    // shapes mimic the reference's own engine logs); variable tokens
    // (hex ids, numbers) mask to <HEX>/<N>, identical masks group.
    GraftQuery(
      "x_obs_log_templates",
      (s, dir) => {
        val ev = eventsWithCents(s, dir)
        val k = regexp_extract(col("props"), "[0-9]+", 0)
        val msg = when(col("event_type") === "error",
            concat(lit("failed to flush chunk "), col("event_id"),
              lit(" retries="), k))
          .when(col("event_type") === "click",
            concat(lit("GET /api/item/"), col("event_id"),
              lit(" status=200 bytes="), col("cents")))
          .when(col("event_type") === "purchase",
            concat(lit("order "), col("event_id"), lit(" amount_cents="),
              col("cents"), lit(" user="), col("user_id")))
          .when(col("event_type") === "signup",
            concat(lit("new user "), col("user_id"), lit(" ref="),
              md5(col("user_id").cast("string"))))
          .otherwise(concat(lit("GET /page/"), k, lit(" user="),
            col("user_id")))
        val line = concat(lit("["), expr("ts_ns div 1000"), lit("] "), msg)
        Observability.logTemplates(ev.withColumn("line", line),
          col("line"), col("user_id"))
      },
      Some(S + """,
             l AS (SELECT user_id,
                     '[' || CAST(ts_ns // 1000 AS VARCHAR) || '] ' ||
                     CASE event_type
                       WHEN 'error' THEN 'failed to flush chunk ' ||
                         event_id || ' retries=' ||
                         regexp_extract(props, '[0-9]+')
                       WHEN 'click' THEN 'GET /api/item/' || event_id ||
                         ' status=200 bytes=' || cents
                       WHEN 'purchase' THEN 'order ' || event_id ||
                         ' amount_cents=' || cents || ' user=' || user_id
                       WHEN 'signup' THEN 'new user ' || user_id ||
                         ' ref=' || md5(CAST(user_id AS VARCHAR))
                       ELSE 'GET /page/' ||
                         regexp_extract(props, '[0-9]+') ||
                         ' user=' || user_id END AS line
                   FROM s)
             SELECT regexp_replace(regexp_replace(line,
                      '[0-9a-f]{20,}', '<HEX>', 'g'),
                      '[0-9]+', '<N>', 'g') AS template,
                    CAST(count(*) AS BIGINT) AS n_lines,
                    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                    min(line) AS first_line
             FROM l GROUP BY 1""")
    ),

    // OTLP-shaped service dependency graph: spans assemble child→parent
    // by (trace_id, parent_span_id) equi-join — never by arrival order —
    // and aggregate to service edges with exact latency sums.
    GraftQuery(
      "x_obs_service_graph",
      (s, dir) => {
        val base = Tables.events(s, dir)
          .select(col("user_id").as("trace_id"),
            col("event_id").as("span_id"),
            col("event_type").as("service"), col("ts_ns"))
        val spans = base.withColumn("parent_span_id",
          lag(col("span_id"), 1).over(Window.partitionBy(col("trace_id"))
            .orderBy(col("ts_ns"), col("span_id"))))
        // raw base as the parent side: the lag synthesis would otherwise
        // run on BOTH branches of the self-join (measured 2× at sf10)
        Observability.serviceGraph(spans, base)
      },
      Some("""WITH sp AS (SELECT user_id AS trace_id, event_id AS span_id,
                     event_type AS service, epoch_ns(ts) AS ts_ns,
                     lag(event_id) OVER (PARTITION BY user_id
                       ORDER BY epoch_ns(ts), event_id) AS parent_span_id
                   FROM events)
             SELECT p.service AS client, c.service AS server,
                    CAST(count(*) AS BIGINT) AS n_calls,
                    CAST(sum((c.ts_ns - p.ts_ns) // 1000) AS BIGINT)
                      AS latency_us_sum
             FROM sp c JOIN sp p ON c.trace_id = p.trace_id
               AND c.parent_span_id = p.span_id
             GROUP BY 1, 2""")
    ),

    // Two-window SLO burn-rate alert (SRE Workbook): 30-min buckets,
    // 6-h rolling sums, 2% error budget; alert = both windows burn.
    // Integer cross-multiply — no ratio division anywhere.
    GraftQuery(
      "x_obs_slo_burn",
      (s, dir) =>
        Observability.sloBurn(Tables.events(s, dir),
          concat(lit("svc"), col("user_id") % 4), col("ts_ns"),
          col("event_type") === "error"),
      Some("""WITH s AS (SELECT 'svc' || CAST(user_id % 4 AS VARCHAR)
                       AS service,
                     epoch_ns(ts) AS ts_ns,
                     CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS err
                   FROM events),
             b AS (SELECT service,
                     (ts_ns // 1000 // 1800000000) * 1800000000 AS bucket_us,
                     CAST(count(*) AS BIGINT) AS total,
                     CAST(sum(err) AS BIGINT) AS errors
                   FROM s GROUP BY 1, 2),
             r AS (SELECT *,
                     CAST(sum(total) OVER w AS BIGINT) AS long_total,
                     CAST(sum(errors) OVER w AS BIGINT) AS long_errors
                   FROM b WINDOW w AS (PARTITION BY service
                     ORDER BY bucket_us ROWS 11 PRECEDING))
             SELECT service, bucket_us, total, errors, long_total,
                    long_errors,
                    errors * 50 > total AS burn_short,
                    long_errors * 50 > long_total AS burn_long,
                    (errors * 50 > total) AND
                      (long_errors * 50 > long_total) AS page
             FROM r""")
    ),

    // Ordered conversion funnel signup→click→purchase, each step within
    // 7 days of the previous; one exchange drives all three stage
    // windows AND the per-user collapse.
    GraftQuery(
      "x_obs_funnel",
      (s, dir) =>
        Observability.funnel(Tables.events(s, dir), col("user_id"),
            col("ts_ns"), col("event_type"),
            "signup", "click", "purchase", horizonNs = 604800000000000L)
          .withColumn("depth", col("depth").cast("long"))
          // The library keeps the ns sums in DECIMAL(38,0) (exact at any
          // corpus size); the gate boundary re-emits them as STRING because
          // the verify driver's hash layer cannot canonicalize DECIMAL
          // columns (adjudicated in round 10 — values were byte-identical,
          // hash still red). Scale-0 decimal→string is plain digits on both
          // engines, so the compare stays exact.
          .withColumn("step12_ns_sum", col("step12_ns_sum").cast("string"))
          .withColumn("step23_ns_sum", col("step23_ns_sum").cast("string")),
      Some("""WITH e AS (SELECT user_id AS u, epoch_ns(ts) AS t,
                     event_type AS st FROM events),
             w1 AS (SELECT *, min(CASE WHEN st = 'signup' THEN t END)
                      OVER (PARTITION BY u) AS t1 FROM e),
             w2 AS (SELECT *, min(CASE WHEN st = 'click' AND t > t1
                      AND t <= t1 + 604800000000000 THEN t END)
                      OVER (PARTITION BY u) AS t2 FROM w1),
             w3 AS (SELECT *, min(CASE WHEN st = 'purchase' AND t > t2
                      AND t <= t2 + 604800000000000 THEN t END)
                      OVER (PARTITION BY u) AS t3 FROM w2),
             pu AS (SELECT u, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
                    FROM w3 GROUP BY 1)
             SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 3
                         WHEN t2 IS NOT NULL THEN 2
                         WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
                      AS depth,
                    CAST(count(*) AS BIGINT) AS n_users,
                    CAST(CAST(COALESCE(sum(t2 - t1), 0) AS DECIMAL(38,0))
                      AS VARCHAR) AS step12_ns_sum,
                    CAST(CAST(COALESCE(sum(t3 - t2), 0) AS DECIMAL(38,0))
                      AS VARCHAR) AS step23_ns_sum
             FROM pu GROUP BY 1""")
    ),

    // Retention cohorts: cohort = first active day per user; distinct
    // active users per (cohort, day-offset) cell.
    GraftQuery(
      "x_obs_retention",
      (s, dir) =>
        Observability.retentionCohorts(Tables.events(s, dir),
          col("user_id"), col("ts_ns")),
      Some("""WITH e AS (SELECT user_id AS u,
                     epoch_ns(ts) // 86400000000000 AS day FROM events),
             c AS (SELECT *, min(day) OVER (PARTITION BY u) AS cohort_day
                   FROM e),
             d AS (SELECT DISTINCT u, cohort_day, day FROM c)
             SELECT cohort_day, day - cohort_day AS day_offset,
                    CAST(count(*) AS BIGINT) AS n_users
             FROM d GROUP BY 1, 2""")
    ),

    // First-order Markov journey matrix: P(next | current) per event
    // pair as the exact n_pair/n_from fraction (IEEE division of
    // identical integers).
    GraftQuery(
      "x_obs_transitions",
      (s, dir) =>
        Observability.transitions(Tables.events(s, dir), col("user_id"),
          col("ts_ns"), col("event_id"), col("event_type")),
      Some("""WITH e AS (SELECT user_id AS u, epoch_ns(ts) AS tn,
                     event_id AS oid, event_type AS cur FROM events),
             o AS (SELECT *, lead(cur) OVER (PARTITION BY u
                     ORDER BY tn, oid) AS nxt FROM e),
             c AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n_pair
                   FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2)
             SELECT cur, nxt, n_pair,
                    CAST(sum(n_pair) OVER (PARTITION BY cur) AS BIGINT)
                      AS n_from,
                    CAST(n_pair AS DOUBLE) /
                      CAST(sum(n_pair) OVER (PARTITION BY cur) AS DOUBLE)
                      AS p
             FROM c""")
    ),

    // Burst detection: bucket count vs trailing-12 average, integer
    // cross-multiplied against the actual trailing count.
    GraftQuery(
      "x_obs_burst",
      (s, dir) =>
        Observability.burst(Tables.events(s, dir),
          concat(lit("svc"), col("user_id") % 4), col("ts_ns")),
      Some("""WITH s AS (SELECT 'svc' || CAST(user_id % 4 AS VARCHAR)
                       AS service, epoch_ns(ts) AS ts_ns FROM events),
             b AS (SELECT service,
                     (ts_ns // 1000 // 600000000) * 600000000 AS bucket_us,
                     CAST(count(*) AS BIGINT) AS cnt
                   FROM s GROUP BY 1, 2),
             r AS (SELECT *,
                     CAST(sum(cnt) OVER w AS BIGINT) AS prev_sum,
                     CAST(count(cnt) OVER w AS BIGINT) AS prev_n
                   FROM b WINDOW w AS (PARTITION BY service
                     ORDER BY bucket_us
                     ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING))
             SELECT service, bucket_us, cnt,
                    coalesce(prev_sum, 0) AS prev_sum, prev_n,
                    prev_n > 0 AND cnt * prev_n > prev_sum * 3 AS is_burst
             FROM r""")
    ),

    // Logs-explain-metrics correlation: for every bursting bucket, the
    // error kind that dominates it — burst flags equi-join the
    // per-(service, bucket, kind) error counts, rank-1 per bucket.
    // The cross-signal composition every on-call asks for.
    GraftQuery(
      "x_obs_burst_explain",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val service = concat(lit("svc"), col("user_id") % 4)
        val bursts = Observability.burst(ev, service, col("ts_ns"))
          .select(col("service"), col("bucket_us"), col("cnt"),
            col("is_burst"))
        val errs = ev.filter(col("event_type") === "error")
          .select(service.as("service"),
            expr("(ts_ns div 1000 div 600000000) * 600000000")
              .as("bucket_us"),
            concat(lit("E"),
              expr("CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) % 4"))
              .as("kind"))
          .groupBy(col("service"), col("bucket_us"), col("kind"))
          .agg(count(lit(1)).as("kind_n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("service"), col("bucket_us"))
          .orderBy(col("kind_n").desc, col("kind"))
        bursts.join(errs, Seq("service", "bucket_us"), "left")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("service"), col("bucket_us"), col("cnt"),
            col("is_burst"), col("kind").as("top_kind"),
            col("kind_n").as("top_kind_n"))
      },
      Some("""WITH s AS (SELECT 'svc' || CAST(user_id % 4 AS VARCHAR)
                       AS service, epoch_ns(ts) AS ts_ns, event_type,
                       props
                   FROM events),
             b AS (SELECT service,
                     (ts_ns // 1000 // 600000000) * 600000000 AS bucket_us,
                     CAST(count(*) AS BIGINT) AS cnt
                   FROM s GROUP BY 1, 2),
             r AS (SELECT *,
                     CAST(sum(cnt) OVER w AS BIGINT) AS prev_sum,
                     CAST(count(cnt) OVER w AS BIGINT) AS prev_n
                   FROM b WINDOW w AS (PARTITION BY service
                     ORDER BY bucket_us
                     ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING)),
             bb AS (SELECT service, bucket_us, cnt,
                      prev_n > 0 AND cnt * prev_n > prev_sum * 3
                        AS is_burst
                    FROM r),
             e AS (SELECT service,
                     (ts_ns // 1000 // 600000000) * 600000000 AS bucket_us,
                     'E' || CAST(CAST(regexp_extract(props, '[0-9]+')
                       AS BIGINT) % 4 AS VARCHAR) AS kind
                   FROM s WHERE event_type = 'error'),
             ec AS (SELECT service, bucket_us, kind,
                      CAST(count(*) AS BIGINT) AS kind_n
                    FROM e GROUP BY 1, 2, 3),
             j AS (SELECT bb.service, bb.bucket_us, bb.cnt, bb.is_burst,
                     ec.kind, ec.kind_n,
                     row_number() OVER (PARTITION BY bb.service,
                       bb.bucket_us ORDER BY ec.kind_n DESC, ec.kind)
                       AS rk
                   FROM bb LEFT JOIN ec ON bb.service = ec.service
                     AND bb.bucket_us = ec.bucket_us)
             SELECT service, bucket_us, cnt, is_burst, kind AS top_kind,
                    kind_n AS top_kind_n
             FROM j WHERE rk = 1""")
    ),

    // Train/val/test leakage matrix: distinct 5-gram shingles per hash
    // split, pairwise shared-gram counts via a gram-hash equi-join —
    // the decontamination audit a random document split needs.
    GraftQuery(
      "x_split_leakage",
      (s, dir) => {
        val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
          16, 10).cast("long") % 10
        val lbl = when(h <= 7, "train").when(h === 8, "val")
          .otherwise("test")
        val hashes = org.apache.spark.sql.graftshim.shim.column(
          graft.functions.ShingleHash(
            org.apache.spark.sql.graftshim.shim.expression(col("text")),
            5, 15))
        // no distinct, no self-join: ONE gh-keyed aggregate folds each
        // gram to per-split presence flags (map-side partials collapse
        // repeats), and the pair counts are three flag-product sums
        val flags = Tables.documents(s, dir)
          .select(lbl.as("split"), explode(hashes).as("gh"))
          .groupBy(col("gh"))
          .agg(max((col("split") === "train").cast("long")).as("ht"),
            max((col("split") === "val").cast("long")).as("hv"),
            max((col("split") === "test").cast("long")).as("hs"))
        flags.agg(
            sum(col("hs") * col("ht")).as("c_test_train"),
            sum(col("hs") * col("hv")).as("c_test_val"),
            sum(col("ht") * col("hv")).as("c_train_val"))
          .select(explode(array(
            struct(lit("test").as("sa"), lit("train").as("sb"),
              col("c_test_train").as("shared_grams")),
            struct(lit("test").as("sa"), lit("val").as("sb"),
              col("c_test_val").as("shared_grams")),
            struct(lit("train").as("sa"), lit("val").as("sb"),
              col("c_train_val").as("shared_grams")))).as("r"))
          .select(col("r.sa"), col("r.sb"), col("r.shared_grams"))
          .filter(col("shared_grams") > 0)
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS l,
                     CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                            1, 8))::BIGINT % 10 <= 7 THEN 'train'
                          WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                            1, 8))::BIGINT % 10 = 8 THEN 'val'
                          ELSE 'test' END AS split
                   FROM documents),
             ix AS (SELECT doc_id, split, l,
                      unnest(range(0, len(l))) AS i FROM d),
             t AS (SELECT doc_id, split, l[i+1] AS term, i AS pos
                   FROM ix WHERE l[i+1] <> ''),
             g0 AS (SELECT doc_id, split,
                      term || ' ' || lead(term, 1) OVER w || ' ' ||
                      lead(term, 2) OVER w || ' ' ||
                      lead(term, 3) OVER w || ' ' ||
                      lead(term, 4) OVER w AS g
                    FROM t WINDOW w AS (PARTITION BY doc_id
                      ORDER BY pos)),
             g1 AS (SELECT DISTINCT split,
                      ('0x' || substr(md5(g), 1, 15))::BIGINT AS gh
                    FROM g0 WHERE g IS NOT NULL)
             SELECT a.split AS sa, b.split AS sb,
                    CAST(count(DISTINCT a.gh) AS BIGINT) AS shared_grams
             FROM g1 a JOIN g1 b ON a.gh = b.gh AND a.split < b.split
             GROUP BY 1, 2""")
    ),

    // Position-based (40/20/40) multi-touch attribution: clicks in the
    // 7-day lookback of each purchase take integer basis-point credit
    // by role; one conversion-keyed exchange drives all three windows.
    GraftQuery(
      "x_attribution_position",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val touches = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("touch_id"),
            col("user_id").as("t_user"), col("ts_ns").as("t_ts"))
        val convs = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("conv_id"),
            col("user_id").as("c_user"), col("ts_ns").as("c_ts"))
        Observability.attribution(touches, convs,
          horizonNs = 604800000000000L)
      },
      Some("""WITH t AS (SELECT event_id AS touch_id, user_id AS t_user,
                     epoch_ns(ts) AS t_ts FROM events
                   WHERE event_type = 'click'),
             c AS (SELECT event_id AS conv_id, user_id AS c_user,
                     epoch_ns(ts) AS c_ts FROM events
                   WHERE event_type = 'purchase'),
             j AS (SELECT * FROM t JOIN c ON t_user = c_user
                   AND t_ts < c_ts AND t_ts >= c_ts - 604800000000000),
             r AS (SELECT *,
                     row_number() OVER (PARTITION BY conv_id
                       ORDER BY t_ts, touch_id) AS rk_first,
                     row_number() OVER (PARTITION BY conv_id
                       ORDER BY t_ts DESC, touch_id DESC) AS rk_last,
                     CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT)
                       AS n_touches
                   FROM j),
             rr AS (SELECT conv_id, touch_id, rk_first,
                      CASE WHEN n_touches = 1 THEN 'only'
                           WHEN rk_first = 1 THEN 'first'
                           WHEN rk_last = 1 THEN 'last'
                           ELSE 'middle' END AS role,
                      n_touches
                    FROM r)
             SELECT conv_id, touch_id, role,
                    CAST(CASE WHEN role = 'only' THEN 10000
                         WHEN n_touches = 2 THEN 5000
                         WHEN role = 'middle'
                           THEN 2000 // (n_touches - 2)
                             + CASE WHEN rk_first = 2
                                 THEN 2000 % (n_touches - 2) ELSE 0 END
                         ELSE 4000 END AS BIGINT) AS credit_bp,
                    n_touches
             FROM rr""")
    ),

    // Top-N-plus-other: per day keep the 3 busiest types, fold the tail
    // into 'other' — rank + re-aggregate over key-cardinality rows.
    GraftQuery(
      "x_obs_topn_other",
      (s, dir) =>
        Observability.topNOther(Tables.events(s, dir), col("event_type"),
          col("ts_ns")),
      Some("""WITH c AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
                     event_type AS key, CAST(count(*) AS BIGINT) AS cnt
                   FROM events GROUP BY 1, 2),
             r AS (SELECT *, row_number() OVER (PARTITION BY day
                     ORDER BY cnt DESC, key) AS rk FROM c)
             SELECT day,
                    CASE WHEN rk <= 3 THEN key ELSE 'other' END AS label,
                    CAST(sum(cnt) AS BIGINT) AS cnt,
                    CAST(count(*) AS BIGINT) AS n_keys
             FROM r GROUP BY 1, 2""")
    ),

    // Share-of-total + day-over-day share shift in integer basis points.
    GraftQuery(
      "x_obs_share_shift",
      (s, dir) =>
        Observability.shareShift(Tables.events(s, dir), col("event_type"),
          col("ts_ns")),
      Some("""WITH c AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
                     event_type AS key, CAST(count(*) AS BIGINT) AS cnt
                   FROM events GROUP BY 1, 2),
             s2 AS (SELECT *,
                      CAST(sum(cnt) OVER (PARTITION BY day) AS BIGINT)
                        AS day_total
                    FROM c),
             s3 AS (SELECT *, (cnt * 10000) // day_total AS share_bp
                    FROM s2)
             SELECT day, key, cnt, day_total,
                    CAST(share_bp AS BIGINT) AS share_bp,
                    CAST(lag(share_bp) OVER (PARTITION BY key ORDER BY day)
                      AS BIGINT) AS prev_share_bp,
                    CAST(share_bp - lag(share_bp) OVER (PARTITION BY key
                      ORDER BY day) AS BIGINT) AS delta_bp
             FROM s3""")
    ),

    // Alert hysteresis over the burst flags: fire after 3 consecutive
    // bursting buckets, resolve after 2 quiet ones — the state machine
    // as window algebra (most-recent-event-wins running maxima).
    GraftQuery(
      "x_obs_alert_hysteresis",
      (s, dir) =>
        Observability.alertHysteresis(
          Observability.burst(Tables.events(s, dir),
              concat(lit("svc"), col("user_id") % 4), col("ts_ns"))
            .select(col("service"), col("bucket_us"), col("is_burst"))),
      Some("""WITH s AS (SELECT 'svc' || CAST(user_id % 4 AS VARCHAR)
                       AS service, epoch_ns(ts) AS ts_ns FROM events),
             b AS (SELECT service,
                     (ts_ns // 1000 // 600000000) * 600000000 AS bucket_us,
                     CAST(count(*) AS BIGINT) AS cnt
                   FROM s GROUP BY 1, 2),
             r AS (SELECT *,
                     CAST(sum(cnt) OVER w AS BIGINT) AS prev_sum,
                     CAST(count(cnt) OVER w AS BIGINT) AS prev_n
                   FROM b WINDOW w AS (PARTITION BY service
                     ORDER BY bucket_us
                     ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING)),
             f AS (SELECT service, bucket_us,
                     prev_n > 0 AND cnt * prev_n > prev_sum * 3 AS is_burst
                   FROM r),
             ev AS (SELECT *,
                      coalesce(is_burst
                        AND lag(is_burst, 1) OVER w2
                        AND lag(is_burst, 2) OVER w2, false) AS fire,
                      coalesce(NOT is_burst
                        AND NOT lag(is_burst, 1) OVER w2, false) AS resolve
                    FROM f WINDOW w2 AS (PARTITION BY service
                      ORDER BY bucket_us)),
             st AS (SELECT service, bucket_us, is_burst,
                      max(CASE WHEN fire THEN bucket_us END) OVER w3
                        AS fired_at,
                      max(CASE WHEN resolve THEN bucket_us END) OVER w3
                        AS resolved_at
                    FROM ev WINDOW w3 AS (PARTITION BY service
                      ORDER BY bucket_us ROWS UNBOUNDED PRECEDING))
             SELECT service, bucket_us, is_burst, fired_at, resolved_at,
                    fired_at IS NOT NULL AND (resolved_at IS NULL
                      OR fired_at > resolved_at) AS active
             FROM st""")
    ),

    // Apdex score at T=500 cents: exact integer fraction + the IEEE
    // division of those exact operands.
    GraftQuery(
      "x_obs_apdex",
      (s, dir) =>
        Observability.apdex(eventsWithCents(s, dir),
          col("event_type"), col("cents"), t = 500L),
      Some(S + """
             SELECT event_type AS service,
                    CAST(sum(CASE WHEN cents <= 500 THEN 1 ELSE 0 END)
                      AS BIGINT) AS satisfied,
                    CAST(sum(CASE WHEN cents > 500 AND cents <= 2000
                      THEN 1 ELSE 0 END) AS BIGINT) AS tolerating,
                    CAST(sum(CASE WHEN cents > 2000 THEN 1 ELSE 0 END)
                      AS BIGINT) AS frustrated,
                    CAST(count(*) AS BIGINT) AS total,
                    CAST(sum(CASE WHEN cents <= 500 THEN 2
                             WHEN cents <= 2000 THEN 1 ELSE 0 END)
                      AS BIGINT) AS score_num,
                    CAST(count(*) * 2 AS BIGINT) AS score_den,
                    CAST(sum(CASE WHEN cents <= 500 THEN 2
                             WHEN cents <= 2000 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(count(*) * 2 AS DOUBLE) AS apdex
             FROM s GROUP BY 1""")
    ),

    // Trending top-k: per day, the 3 busiest event types, total-ordered
    // (count desc, key) — rank over aggregated partials only.
    GraftQuery(
      "x_obs_trending",
      (s, dir) =>
        Observability.trending(Tables.events(s, dir), col("event_type"),
          col("ts_ns")),
      Some("""WITH c AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
                     event_type AS key, CAST(count(*) AS BIGINT) AS cnt
                   FROM events GROUP BY 1, 2),
             r AS (SELECT *, row_number() OVER (PARTITION BY day
                     ORDER BY cnt DESC, key) AS rk FROM c)
             SELECT day, CAST(rk AS BIGINT) AS rk, key, cnt
             FROM r WHERE rk <= 3""")
    ),

    // HDR sketch rollup: 10-min histogram rows MERGE (cell-wise count
    // add) into 1-hour quantiles — the TSDB compaction path; raw values
    // are touched exactly once, at fine granularity.
    GraftQuery(
      "x_obs_hdr_rollup",
      (s, dir) =>
        Observability.hdrRollup(eventsWithCents(s, dir), col("event_type"),
          col("ts_ns"), col("cents")),
      Some("""WITH s AS (SELECT event_type AS series, epoch_ns(ts) AS tn,
                     greatest(CAST(CAST(value AS DECIMAL(18,2)) * 100
                       AS BIGINT), 0) AS v
                   FROM events),
             b AS (SELECT series, tn // 1000 // 600000000 AS fine, v,
                     greatest(length(format('{:b}', v)) - 5, 0) AS sh
                   FROM s),
             f AS (SELECT series, fine, CAST((v >> sh) << sh AS BIGINT)
                       AS lo,
                     CAST(count(*) AS BIGINT) AS cnt
                   FROM b GROUP BY 1, 2, 3),
             c AS (SELECT series, (fine // 6) * 6 * 600000000 AS hour_us,
                     lo, CAST(sum(cnt) AS BIGINT) AS cnt
                   FROM f GROUP BY 1, 2, 3),
             cc AS (SELECT series, hour_us, lo,
                      sum(cnt) OVER (PARTITION BY series, hour_us
                        ORDER BY lo ROWS UNBOUNDED PRECEDING) AS cum,
                      sum(cnt) OVER (PARTITION BY series, hour_us) AS total
                    FROM c),
             q AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p99', 99, 100))
                     AS t(q, num, den)),
             j AS (SELECT cc.series, cc.hour_us, q.q,
                     (cc.total * q.num + q.den - 1) // q.den AS needed,
                     cc.lo, cc.cum
                   FROM cc, q)
             SELECT series, hour_us, q,
                    CAST(min(needed) AS BIGINT) AS rank_needed,
                    CAST(min(lo) AS BIGINT) AS bucket_lo
             FROM j WHERE cum >= needed GROUP BY 1, 2, 3""")
    ),

    // Two-pass heavy hitters (φ=1%): deterministic md5 row-sample pass
    // elects candidates, exact pass counts ONLY those — full key
    // cardinality never crosses the wire. Key synthesis plants 7 heavy
    // keys over a 9973-key light tail.
    GraftQuery(
      "x_topk_heavyhitters",
      (s, dir) => {
        // numeric keys: a string key costs an allocation per row per
        // pass (120M at sf10) on BOTH engines for zero semantic value
        val rows = Tables.lineitem(s, dir)
          .select((col("l_partkey") %
              when(col("l_orderkey") % 4 === 0, 7).otherwise(9973))
              .cast("long").as("key"),
            (col("l_orderkey") * 10 + col("l_linenumber")).as("rid"))
        graft.sketch.Sketches.heavyHitters(rows, col("key"), col("rid"))
      },
      Some("""WITH r AS (SELECT CAST(l_partkey %
                       (CASE WHEN l_orderkey % 4 = 0 THEN 7 ELSE 9973 END)
                       AS BIGINT) AS key,
                     l_orderkey * 10 + l_linenumber AS rid
                   FROM lineitem),
             nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r),
             sm AS (SELECT key FROM r
                    WHERE ('0x' || substr(md5(CAST(rid AS VARCHAR)),
                      1, 8))::BIGINT % 8 = 0),
             sc AS (SELECT key, CAST(count(*) AS BIGINT) AS scnt
                    FROM sm GROUP BY 1),
             cand AS (SELECT key, scnt FROM sc, nn
                      WHERE scnt * 1600 >= n),
             ex AS (SELECT r.key, CAST(count(*) AS BIGINT) AS cnt,
                      min(cand.scnt) AS scnt
                    FROM r JOIN cand USING (key) GROUP BY 1)
             SELECT ex.key, ex.cnt, ex.scnt, nn.n
             FROM ex, nn WHERE ex.cnt * 100 >= nn.n""")
    ),

    // URL canonicalization dedup (C4/RefinedWeb provenance pass): messy
    // variants — scheme/host case, default ports, fragments, utm_*
    // params, param order — collapse to one canonical URL; keeper =
    // lowest doc_id. Synthesis plants 4-doc variant groups via K=doc_id/4.
    GraftQuery(
      "x_url_canonicalize",
      (s, dir) => {
        val k = expr("doc_id div 4")
        val schemeRaw = when(col("doc_id") % 3 === 0, "HTTP")
          .when(col("doc_id") % 3 === 1, "https").otherwise("http")
        val hostBase = concat(lit("www.example"), k % 7, lit(".com"))
        val hostRaw = when(col("doc_id") % 2 === 0, upper(hostBase))
          .otherwise(hostBase)
        val portRaw = when(col("doc_id") % 5 === 0,
            when(lower(schemeRaw) === "http", ":80").otherwise(":443"))
          .when(col("doc_id") % 5 === 1, lit(":8080")).otherwise(lit(""))
        val qRaw = when(col("doc_id") % 4 === 0,
            concat(lit("?utm_source=feed&id="), k))
          .when(col("doc_id") % 4 === 1,
            concat(lit("?id="), k, lit("&utm_medium=email")))
          .when(col("doc_id") % 4 === 2, concat(lit("?id="), k))
          .otherwise(lit(""))
        val frag = when(col("doc_id") % 3 === 0, "#sec2").otherwise("")
        val docs = Tables.documents(s, dir).withColumn("url",
          concat(schemeRaw, lit("://"), hostRaw, portRaw, lit("/p/"), k,
            qRaw, frag))
        graft.text.UrlCanon.dedupByCanonical(docs, col("doc_id"), col("url"))
      },
      Some("""WITH u AS (SELECT doc_id,
                     (CASE doc_id % 3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https'
                        ELSE 'http' END) || '://' ||
                     (CASE WHEN doc_id % 2 = 0
                        THEN upper('www.example' ||
                          CAST((doc_id // 4) % 7 AS VARCHAR) || '.com')
                        ELSE 'www.example' ||
                          CAST((doc_id // 4) % 7 AS VARCHAR) || '.com' END) ||
                     (CASE WHEN doc_id % 5 = 0 THEN
                        (CASE WHEN doc_id % 3 = 0 OR doc_id % 3 = 2
                           THEN ':80' ELSE ':443' END)
                       WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END) ||
                     '/p/' || CAST(doc_id // 4 AS VARCHAR) ||
                     (CASE doc_id % 4
                        WHEN 0 THEN '?utm_source=feed&id=' ||
                          CAST(doc_id // 4 AS VARCHAR)
                        WHEN 1 THEN '?id=' || CAST(doc_id // 4 AS VARCHAR) ||
                          '&utm_medium=email'
                        WHEN 2 THEN '?id=' || CAST(doc_id // 4 AS VARCHAR)
                        ELSE '' END) ||
                     (CASE WHEN doc_id % 3 = 0 THEN '#sec2' ELSE '' END)
                       AS url
                   FROM documents),
             c AS (SELECT doc_id, url,
                     lower(substr(url, 1, strpos(url, '://') - 1)) AS scheme,
                     substr(url, strpos(url, '://') + 3) AS rest
                   FROM u),
             f AS (SELECT *, string_split(rest, '#')[1] AS rest2 FROM c),
             hp AS (SELECT *, string_split(rest2, '/')[1] AS hostport,
                      substr(rest2,
                        length(string_split(rest2, '/')[1]) + 1) AS pathq
                    FROM f),
             h AS (SELECT *, lower(string_split(hostport, ':')[1]) AS host,
                     CASE WHEN strpos(hostport, ':') > 0
                       THEN substr(hostport, strpos(hostport, ':') + 1)
                       ELSE '' END AS port
                   FROM hp),
             p AS (SELECT *, string_split(pathq, '?')[1] AS path,
                     CASE WHEN strpos(pathq, '?') > 0
                       THEN substr(pathq,
                         length(string_split(pathq, '?')[1]) + 2)
                       ELSE '' END AS q
                   FROM h),
             canon AS (SELECT doc_id, url,
                 scheme || '://' || host ||
                 (CASE WHEN port = '' THEN ''
                       WHEN scheme = 'http' AND port = '80' THEN ''
                       WHEN scheme = 'https' AND port = '443' THEN ''
                       ELSE ':' || port END) ||
                 path ||
                 (CASE WHEN len(list_filter(string_split(q, '&'),
                        x -> x <> '' AND substr(x, 1, 4) <> 'utm_')) = 0
                       THEN ''
                       ELSE '?' || array_to_string(
                         list_sort(list_filter(string_split(q, '&'),
                           x -> x <> '' AND substr(x, 1, 4) <> 'utm_')),
                         '&') END) AS canon
               FROM p)
             SELECT doc_id, url, canon,
                    doc_id = min(doc_id) OVER (PARTITION BY canon) AS kept,
                    CAST(count(*) OVER (PARTITION BY canon) AS BIGINT)
                      AS n_variants
             FROM canon""")
    ),

    // Robust outlier detection: per-service median/MAD (lower medians,
    // integer-exact), outlier = |v - med| > 5·MAD.
    GraftQuery(
      "x_obs_anomaly_mad",
      (s, dir) =>
        Observability.anomalyMad(eventsWithCents(s, dir),
          col("event_type"), col("cents"), k = 5),
      Some("""WITH s AS (SELECT event_type AS g,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
                   FROM events),
             c1 AS (SELECT g, v, count(*) AS cnt FROM s GROUP BY 1, 2),
             cc1 AS (SELECT g, v,
                       sum(cnt) OVER (PARTITION BY g ORDER BY v
                         ROWS UNBOUNDED PRECEDING) AS cum,
                       sum(cnt) OVER (PARTITION BY g) AS total
                     FROM c1),
             m1 AS (SELECT g, min(v) AS med FROM cc1
                    WHERE cum >= (total + 1) // 2 GROUP BY 1),
             dv AS (SELECT s.g, abs(s.v - m1.med) AS v
                    FROM s JOIN m1 USING (g)),
             c2 AS (SELECT g, v, count(*) AS cnt FROM dv GROUP BY 1, 2),
             cc2 AS (SELECT g, v,
                       sum(cnt) OVER (PARTITION BY g ORDER BY v
                         ROWS UNBOUNDED PRECEDING) AS cum,
                       sum(cnt) OVER (PARTITION BY g) AS total
                     FROM c2),
             m2 AS (SELECT g, min(v) AS mad FROM cc2
                    WHERE cum >= (total + 1) // 2 GROUP BY 1)
             SELECT s.g AS service, CAST(min(m1.med) AS BIGINT) AS median_v,
                    CAST(min(m2.mad) AS BIGINT) AS mad_v,
                    CAST(count(*) AS BIGINT) AS n_total,
                    CAST(sum(CASE WHEN abs(s.v - m1.med) > m2.mad * 5
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             FROM s JOIN m1 USING (g) JOIN m2 USING (g) GROUP BY 1""")
    )
  )
}
