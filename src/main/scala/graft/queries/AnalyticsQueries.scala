package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.obs.{Observability, Timeseries}
import graft.graph.{GraphFixtures, KCore}

/** Behavioral / structural analytics gates: top session paths, traffic
  * concentration (Gini), bounded k-core peeling, seasonal-adjusted
  * anomalies. Compositions of the existing session, quantile, profile
  * and graph machinery — all integer-exact, all DuckDB hash-gated.
  */
object AnalyticsQueries {

  private val GapNs = 1800000000000L // 30-min session gap

  /** Oracle token stream over `documents` (same split as text/Search). */
  private val T0 =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS l
                  FROM documents),
             ix AS (SELECT doc_id, l, unnest(range(0, len(l))) AS i FROM d),
             t AS (SELECT doc_id, l[i+1] AS term, i AS pos FROM ix
                   WHERE l[i+1] <> '')"""

  def all: Seq[GraftQuery] = Seq(

    // Top-20 session paths: 30-min-gap sessions, the ordered event-type
    // string per session, global top-k with a total order. ONE user-keyed
    // exchange feeds the gap window, the running session id, and the
    // per-session collapse (same partitioning prefix); only distinct
    // paths shuffle again.
    GraftQuery(
      "x_obs_top_paths",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ns"), col("event_id"))
        val newS = when(lag(col("ts_ns"), 1).over(w).isNull ||
          col("ts_ns") - lag(col("ts_ns"), 1).over(w) >= GapNs, 1L)
          .otherwise(0L)
        Tables.events(s, dir)
          .select(col("user_id"), col("ts_ns"), col("event_id"),
            col("event_type"))
          .withColumn("sid", sum(newS).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sid"))
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("ts_ns"), col("event_id"),
              col("event_type")))), x => x("event_type")), ">").as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path"))
          .limit(20)
      },
      Some(s"""WITH s AS (SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
                      event_type
                    FROM events),
             x AS (SELECT *, CASE WHEN lag(ts_ns) OVER w IS NULL
                       OR ts_ns - lag(ts_ns) OVER w >= $GapNs
                     THEN 1 ELSE 0 END AS new_s
                   FROM s
                   WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts_ns, event_id)),
             y AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
                       ORDER BY ts_ns, event_id ROWS UNBOUNDED PRECEDING)
                       AS sid
                   FROM x),
             p AS (SELECT user_id, sid,
                     string_agg(event_type, '>'
                       ORDER BY ts_ns, event_id) AS path
                   FROM y GROUP BY 1, 2)
             SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
             FROM p GROUP BY 1
             ORDER BY n_sessions DESC, path LIMIT 20""")
    ),

    // Traffic concentration per event type: exact Gini over the per-user
    // count distribution (ascending rank; tie blocks contribute a fixed
    // rank sum, so ties cannot perturb the result). ppm via truncating
    // div. The ranked relation is |users| rows — aggregated before
    // anything heavy.
    GraftQuery(
      "x_profile_gini",
      (s, dir) => {
        val c = Tables.events(s, dir)
          .groupBy(col("event_type").as("series"), col("user_id"))
          .agg(count(lit(1)).as("c"))
        val wr = Window.partitionBy(col("series"))
          .orderBy(col("c"), col("user_id"))
        c.withColumn("i", row_number().over(wr).cast("long"))
          .groupBy(col("series"))
          .agg(count(lit(1)).as("n_users"), sum(col("c")).as("total"),
            sum(col("i") * col("c")).as("sic"))
          .select(col("series"), col("n_users"), col("total"),
            expr("""(1000000 * (2 * sic - (n_users + 1) * total))
                    div (n_users * total)""").as("gini_ppm"))
      },
      Some("""WITH c AS (SELECT event_type AS series, user_id,
                     CAST(count(*) AS BIGINT) AS c
                   FROM events GROUP BY 1, 2),
             r AS (SELECT series, c,
                     CAST(row_number() OVER (PARTITION BY series
                       ORDER BY c, user_id) AS BIGINT) AS i
                   FROM c),
             a AS (SELECT series, CAST(count(*) AS BIGINT) AS n_users,
                     CAST(sum(c) AS BIGINT) AS total,
                     CAST(sum(i * c) AS BIGINT) AS sic
                   FROM r GROUP BY 1)
             SELECT series, n_users, total,
                    (1000000 * (2 * sic - (n_users + 1) * total))
                      // (n_users * total) AS gini_ppm
             FROM a""")
    ),

    // Bounded k-core peeling (k=3, 5 passes) over the planted graph:
    // the peeling curve (nodes/edges after each pass). Survivor nodes
    // are defined as endpoints of surviving edges.
    GraftQuery(
      "x_graph_kcore",
      (s, dir) => KCore.peel(GraphFixtures.plantedEdges(s, dir),
        k = 3, rounds = 5, inputMaterialized = true),
      Some {
        val head =
          """WITH nodes AS (SELECT doc_id AS id FROM documents),
             nn AS (SELECT count(*) AS n FROM documents),
             e0x AS (SELECT id AS s, (id * 3 + 1) % n AS d FROM nodes, nn
                     UNION ALL SELECT id, (id * 4 + 2) % n FROM nodes, nn
                     UNION ALL SELECT id, (id * 5 + 3) % n FROM nodes, nn
                     UNION ALL SELECT id, id % 13 FROM nodes),
             e0 AS MATERIALIZED (
                    SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                    FROM e0x WHERE s <> d)"""
        // every round references its predecessor several times — without
        // MATERIALIZED DuckDB re-inlines the whole chain per reference
        // (the same 6^rounds blowup the Spark side truncates with
        // localCheckpoint) and exhausts file handles re-opening the scan
        val peels = (1 to 5).map { r =>
          s""",
             d$r AS MATERIALIZED (
                     SELECT v, count(*) AS dg FROM
                       (SELECT a AS v FROM e${r - 1}
                        UNION ALL SELECT b FROM e${r - 1})
                     GROUP BY 1),
             k$r AS MATERIALIZED (SELECT v FROM d$r WHERE dg >= 3),
             e$r AS MATERIALIZED (
                     SELECT a, b FROM e${r - 1}
                     WHERE a IN (SELECT v FROM k$r)
                       AND b IN (SELECT v FROM k$r))"""
        }.mkString
        val rows = (1 to 5).map { r =>
          s"""SELECT CAST($r AS BIGINT) AS round,
                (SELECT CAST(count(DISTINCT v) AS BIGINT) FROM
                  (SELECT a AS v FROM e$r UNION ALL SELECT b FROM e$r))
                  AS n_nodes,
                (SELECT CAST(count(*) AS BIGINT) FROM e$r) AS n_edges"""
        }.mkString("\n             UNION ALL\n             ")
        head + peels + "\n             " + rows
      }
    ),

    // Latency heatmap: exact p50/p95 per (series, 1-hour bucket) — the
    // two-key grouped-quantile spine; parallelism follows the heatmap's
    // cell count, no global sort anywhere.
    GraftQuery(
      "x_obs_latency_bands",
      (s, dir) =>
        graft.ops.Quantiles.groupedQuantiles2(
          Tables.events(s, dir)
            .withColumn("cents", Observability.cents(col("value")))
            .withColumn("bucket_us",
              expr("(ts_ns div 1000 div 3600000000) * 3600000000")),
          col("event_type"), col("bucket_us"), col("cents"),
          Seq(("p50", 1, 2), ("p95", 19, 20)))
          .select(col("g1").as("series"), col("g2").as("bucket_us"),
            col("q"), col("rank_needed"), col("value")),
      Some("""WITH s AS (SELECT event_type AS series,
                     (epoch_ns(ts) // 1000 // 3600000000) * 3600000000
                       AS bucket_us,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS v
                   FROM events),
             c AS (SELECT series, bucket_us, v, count(*) AS cnt
                   FROM s GROUP BY 1, 2, 3),
             cc AS (SELECT series, bucket_us, v,
                      sum(cnt) OVER (PARTITION BY series, bucket_us
                        ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
                      sum(cnt) OVER (PARTITION BY series, bucket_us)
                        AS total
                    FROM c),
             q AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p95', 19, 20))
                     AS t(q, num, den)),
             j AS (SELECT cc.series, cc.bucket_us, q.q,
                     (cc.total * q.num + q.den - 1) // q.den AS needed,
                     cc.v, cc.cum
                   FROM cc, q)
             SELECT series, bucket_us, q,
                    CAST(min(needed) AS BIGINT) AS rank_needed,
                    CAST(min(v) AS BIGINT) AS value
             FROM j WHERE cum >= needed GROUP BY 1, 2, 3""")
    ),

    // Z-order layout keys: interleave 16+16 bits of (minute band, cent
    // band) and report each top-8-bit curve cell's bounds in BOTH
    // dimensions — the locality property data-layout clustering (file
    // skipping / min-max pruning) buys at 100 TB: every cell is a tight
    // rectangle in (time, value), so a predicate on EITHER dimension
    // prunes cells. Pure integer bit math, identical operators in Spark
    // SQL and DuckDB.
    GraftQuery(
      "x_layout_zorder",
      (s, dir) => {
        val terms = (0 until 16).map { i =>
          s"(((tb >> $i) & 1) << ${2 * i}) + (((cb >> $i) & 1) << ${2 * i + 1})"
        }.mkString(" + ")
        Tables.events(s, dir)
          .withColumn("cents", Observability.cents(col("value")))
          .select(expr("(ts_ns div 1000 div 60000000) % 65536").as("tb"),
            least(col("cents"), lit(65535L)).as("cb"))
          .withColumn("z", expr(terms))
          .groupBy(expr("z div 16777216").as("z_cell"))
          .agg(count(lit(1)).as("n"),
            min(col("tb")).as("tb_min"), max(col("tb")).as("tb_max"),
            min(col("cb")).as("cb_min"), max(col("cb")).as("cb_max"))
      },
      Some {
        val terms = (0 until 16).map { i =>
          s"(((tb >> $i) & 1) << ${2 * i}) + (((cb >> $i) & 1) << ${2 * i + 1})"
        }.mkString(" + ")
        s"""WITH s AS (SELECT (epoch_ns(ts) // 1000 // 60000000) % 65536
                       AS tb,
                     least(CAST(CAST(value AS DECIMAL(18,2)) * 100
                       AS BIGINT), 65535) AS cb
                   FROM events),
             z AS (SELECT tb, cb, $terms AS z FROM s)
             SELECT z // 16777216 AS z_cell, CAST(count(*) AS BIGINT) AS n,
                    CAST(min(tb) AS BIGINT) AS tb_min,
                    CAST(max(tb) AS BIGINT) AS tb_max,
                    CAST(min(cb) AS BIGINT) AS cb_min,
                    CAST(max(cb) AS BIGINT) AS cb_max
             FROM z GROUP BY 1"""
      }
    ),

    // Distribution drift between the window's two halves: exact total
    // variation distance per series in ppm — |n1·N2 − n2·N1| summed over
    // $10 value bands, cross-multiplied so no proportion is ever a
    // float. ONE aggregate builds both period histograms (conditional
    // counts), no join; model-monitoring's PSI-class check, exact.
    GraftQuery(
      "x_drift_tvd",
      (s, dir) => {
        val B = 1705363200000000000L // 2024-01-16 00:00 UTC
        val h = Tables.events(s, dir)
          .withColumn("cents", Observability.cents(col("value")))
          .groupBy(col("event_type").as("series"),
            expr("cents div 1000").as("band"))
          .agg(sum(when(col("ts_ns") < B, 1L).otherwise(0L)).as("n1"),
            sum(when(col("ts_ns") >= B, 1L).otherwise(0L)).as("n2"))
        val w = Window.partitionBy(col("series"))
        h.withColumn("t1", sum(col("n1")).over(w))
          .withColumn("t2", sum(col("n2")).over(w))
          .groupBy(col("series"))
          .agg(max(col("t1")).as("n_before"), max(col("t2")).as("n_after"),
            sum(abs(col("n1") * col("t2") - col("n2") * col("t1")))
              .as("tvd_num"))
          .select(col("series"), col("n_before"), col("n_after"),
            expr("(1000000 * tvd_num) div (2 * n_before * n_after)")
              .as("tvd_ppm"))
      },
      Some("""WITH s AS (SELECT event_type AS series,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       // 1000 AS band,
                     CASE WHEN epoch_ns(ts) < 1705363200000000000
                       THEN 1 ELSE 0 END AS p1
                   FROM events),
             h AS (SELECT series, band,
                     CAST(sum(p1) AS BIGINT) AS n1,
                     CAST(sum(1 - p1) AS BIGINT) AS n2
                   FROM s GROUP BY 1, 2),
             t AS (SELECT series, CAST(sum(n1) AS BIGINT) AS t1,
                     CAST(sum(n2) AS BIGINT) AS t2
                   FROM h GROUP BY 1),
             a AS (SELECT h.series, t.t1 AS n_before, t.t2 AS n_after,
                     CAST(sum(abs(h.n1 * t.t2 - h.n2 * t.t1)) AS BIGINT)
                       AS tvd_num
                   FROM h JOIN t USING (series) GROUP BY 1, 2, 3)
             SELECT series, n_before, n_after,
                    (1000000 * tvd_num) // (2 * n_before * n_after)
                      AS tvd_ppm
             FROM a""")
    ),

    // Vocabulary growth curve (Heaps' law): distinct terms and total
    // tokens within the first k docs, k = powers of two — tokenizer
    // sizing statistics. First-occurrence is ONE term-keyed min
    // aggregate; the curve is a 21-point literal explode over bounded
    // aggregates, never a cumulative-distinct window.
    GraftQuery(
      "x_text_vocab_growth",
      (s, dir) => {
        val toks = graft.text.Search.tokens(
          Tables.documents(s, dir), col("doc_id"), col("text"))
        val ks = typedLit((0 to 20).map(1L << _))
        val firstOcc = toks.groupBy(col("term"))
          .agg(min(col("doc_id")).as("first_doc"))
        val vocab = firstOcc.select(explode(ks).as("k"), col("first_doc"))
          .filter(col("first_doc") < col("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("vocab"))
        val tokens = toks.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("dl"))
          .select(explode(ks).as("k"), col("doc_id"), col("dl"))
          .filter(col("doc_id") < col("k"))
          .groupBy(col("k")).agg(sum(col("dl")).as("tokens"))
        vocab.join(tokens, "k")
      },
      Some(T0 + """,
             fo AS (SELECT term, min(doc_id) AS first_doc
                    FROM t GROUP BY 1),
             ks AS (SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128, 256, 512,
                      1024, 2048, 4096, 8192, 16384, 32768, 65536, 131072,
                      262144, 524288, 1048576]) AS k),
             v AS (SELECT k, CAST(count(*) AS BIGINT) AS vocab
                   FROM fo, ks WHERE first_doc < k GROUP BY 1),
             dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
             tk AS (SELECT k, CAST(sum(dl) AS BIGINT) AS tokens
                    FROM dl, ks WHERE doc_id < k GROUP BY 1)
             SELECT CAST(k AS BIGINT) AS k, vocab, tokens
             FROM v JOIN tk USING (k)""")
    ),

    // Funnel conversion latency: seconds from first view to the first
    // later purchase per converting user, exact p50/p90 over the latency
    // distribution — the "how long does conversion take" companion to
    // the funnel count gate.
    GraftQuery(
      "x_obs_funnel_latency",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val fv = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts_ns")).as("fv"))
        val lat = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("ts_ns").as("pts"))
          .join(fv, col("pu") === col("user_id") && col("pts") > col("fv"))
          .groupBy(col("user_id"))
          .agg(min(col("pts")).as("fp"), max(col("fv")).as("fv2"))
          .select(expr("(fp - fv2) div 1000000000").as("lat_s"))
        graft.ops.Quantiles.exactQuantiles(lat, col("lat_s"),
          Seq(("p50", 1, 2), ("p90", 9, 10)))
      },
      Some("""WITH s AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns
                   FROM events),
             fv AS (SELECT user_id, min(ts_ns) AS fv FROM s
                    WHERE event_type = 'view' GROUP BY 1),
             lat AS (SELECT (min(p.ts_ns) - min(fv.fv)) // 1000000000
                       AS v
                     FROM fv JOIN s p ON p.user_id = fv.user_id
                       AND p.event_type = 'purchase' AND p.ts_ns > fv.fv
                     GROUP BY fv.user_id),
             c AS (SELECT v, count(*) AS cnt FROM lat GROUP BY 1),
             cc AS (SELECT v,
                      sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                        AS cum,
                      sum(cnt) OVER () AS total
                    FROM c),
             q AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10))
                     AS t(q, num, den)),
             j AS (SELECT q.q,
                     (cc.total * q.num + q.den - 1) // q.den AS needed,
                     cc.v, cc.cum
                   FROM cc, q)
             SELECT q, CAST(min(needed) AS BIGINT) AS rank_needed,
                    CAST(min(v) AS BIGINT) AS value
             FROM j WHERE cum >= needed GROUP BY 1""")
    ),

    // Compaction planning: greedy byte bin-packing of the (series,
    // 10-min) "files" into 64 KiB target bins by running-offset
    // division — the small-file compaction planner a lakehouse table
    // service runs; one window pass over the file ledger, never the
    // bytes themselves.
    GraftQuery(
      "x_layout_compaction",
      (s, dir) => {
        val files = Tables.events(s, dir)
          .groupBy(col("event_type").as("series"),
            expr("(ts_ns div 1000 div 600000000) * 600000000")
              .as("bucket_us"))
          .agg(sum(length(col("props")) + 16L).as("bytes"))
        val w = Window.partitionBy(col("series")).orderBy(col("bucket_us"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        files
          .withColumn("cum", sum(col("bytes")).over(w))
          .withColumn("bin", expr("(cum - bytes) div 65536"))
          .groupBy(col("series"), col("bin"))
          .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bytes"))
      },
      Some("""WITH f AS (SELECT event_type AS series,
                     (epoch_ns(ts) // 1000 // 600000000) * 600000000
                       AS bucket_us,
                     CAST(sum(length(props) + 16) AS BIGINT) AS bytes
                   FROM events GROUP BY 1, 2),
             c AS (SELECT series, bytes,
                     sum(bytes) OVER (PARTITION BY series ORDER BY
                       bucket_us ROWS UNBOUNDED PRECEDING) AS cum
                   FROM f)
             SELECT series, CAST((cum - bytes) // 65536 AS BIGINT) AS bin,
                    CAST(count(*) AS BIGINT) AS n_files,
                    CAST(sum(bytes) AS BIGINT) AS bytes
             FROM c GROUP BY 1, 2""")
    ),

    // Error-budget burn-down: per hour bucket, cumulative errors vs the
    // cumulative 2% budget of all requests so far — remaining budget in
    // exact ppm of budget (negative = overspent). Two running sums over
    // one bucket-grain aggregate; the SRE companion to the burn-rate
    // alert gate.
    GraftQuery(
      "x_obs_error_budget",
      (s, dir) => {
        val b = graft.ops.BoundedGlobal.bounded(
          Tables.events(s, dir)
            .groupBy(expr("(ts_ns div 1000 div 3600000000) * 3600000000")
              .as("bucket_us"))
            .agg(count(lit(1)).as("n_req"),
              sum((col("event_type") === "error").cast("long")).as("n_err")),
          "x_obs_error_budget hour ledger")
        val w = graft.ops.BoundedGlobal.cumFrame(col("bucket_us"))
        b.withColumn("cum_req", sum(col("n_req")).over(w))
          .withColumn("cum_err", sum(col("n_err")).over(w))
          .select(col("bucket_us"), col("n_req"), col("n_err"),
            col("cum_req"), col("cum_err"),
            // budget = 2% of cum_req; remaining_ppm of budget, exact:
            // (budget − err)/budget = (2·cum_req − 100·cum_err)/(2·cum_req)
            expr("""(1000000 * (2 * cum_req - 100 * cum_err))
                    div (2 * cum_req)""").as("remaining_ppm"))
      },
      Some("""WITH b AS (SELECT
                     (epoch_ns(ts) // 1000 // 3600000000) * 3600000000
                       AS bucket_us,
                     CAST(count(*) AS BIGINT) AS n_req,
                     CAST(sum(CASE WHEN event_type = 'error' THEN 1
                       ELSE 0 END) AS BIGINT) AS n_err
                   FROM events GROUP BY 1),
             c AS (SELECT *,
                     CAST(sum(n_req) OVER (ORDER BY bucket_us
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_req,
                     CAST(sum(n_err) OVER (ORDER BY bucket_us
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_err
                   FROM b)
             SELECT bucket_us, n_req, n_err, cum_req, cum_err,
                    (1000000 * (2 * cum_req - 100 * cum_err))
                      // (2 * cum_req) AS remaining_ppm
             FROM c""")
    ),

    // Common-neighbor link prediction over the planted graph: for the
    // top-20 non-adjacent wedge pairs, common-neighbor count and exact
    // Jaccard ppm (common / (da + db − common)). Common-neighbor wedges
    // are inherently quadratic in CENTER degree, so hub centers
    // (deg > 64) are suppressed before the pair join — the graph
    // analogue of stop-word dropping: a shared celebrity neighbor
    // carries no link signal, and keeping it would put C(hub_deg, 2)
    // pairs in the shuffle. An anti-join drops existing edges.
    GraftQuery(
      "x_graph_link_predict",
      (s, dir) => {
        val edges = GraphFixtures.plantedEdges(s, dir)
        // both wedge sides read the session-cached suppressed adjacency
        // fixture, which carries endpoint degrees — per run only the
        // pair aggregate, the existing-edge anti-join and the top-20
        // rank execute; no |V|-row degree joins anywhere
        val adj = GraphFixtures.suppressedAdj(s, dir)
        val o1 = adj.select(col("u"), col("w").as("x"), col("dgw").as("dx"))
        val o2 = adj.select(col("u").as("u2"), col("w").as("y"),
          col("dgw").as("dy"))
        val common = o1.join(o2,
            col("u") === col("u2") && col("x") < col("y"))
          .groupBy(col("x"), col("y"), col("dx"), col("dy"))
          .agg(count(lit(1)).as("common"))
          .join(edges.select(col("a").as("x"), col("b").as("y")),
            Seq("x", "y"), "left_anti")
        val out = common
          .select(col("x"), col("y"), col("common"),
            expr("(1000000 * common) div (dx + dy - common)")
              .as("jaccard_ppm"))
          .orderBy(col("jaccard_ppm").desc, col("x"), col("y"))
          .limit(20)
        val rows = java.util.Arrays.asList(out.collect(): _*)
        s.createDataFrame(rows, out.schema)
      },
      Some("""WITH nodes AS (SELECT doc_id AS id FROM documents),
             nn AS (SELECT count(*) AS n FROM documents),
             e0 AS (SELECT id AS s, (id * 3 + 1) % n AS d FROM nodes, nn
                    UNION ALL SELECT id, (id * 4 + 2) % n FROM nodes, nn
                    UNION ALL SELECT id, (id * 5 + 3) % n FROM nodes, nn
                    UNION ALL SELECT id, id % 13 FROM nodes),
             e AS MATERIALIZED (
                   SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                   FROM e0 WHERE s <> d),
             deg AS MATERIALIZED (
                   SELECT v, CAST(count(*) AS BIGINT) AS dg FROM
                     (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
                   GROUP BY 1),
             adj AS MATERIALIZED (
                   SELECT u, w FROM (
                     SELECT a AS u, b AS w FROM e
                     UNION ALL SELECT b, a FROM e)
                   WHERE u IN (SELECT v FROM deg WHERE dg <= 64)),
             cm AS (SELECT o1.w AS x, o2.w AS y,
                      CAST(count(*) AS BIGINT) AS common
                    FROM adj o1 JOIN adj o2
                      ON o1.u = o2.u AND o1.w < o2.w
                    GROUP BY 1, 2),
             nc AS (SELECT cm.* FROM cm
                    LEFT JOIN e ON e.a = cm.x AND e.b = cm.y
                    WHERE e.a IS NULL)
             SELECT x, y, common,
                    (1000000 * common) // (da.dg + db.dg - common)
                      AS jaccard_ppm
             FROM nc JOIN deg da ON da.v = nc.x JOIN deg db ON db.v = nc.y
             ORDER BY jaccard_ppm DESC, x, y LIMIT 20""")
    ),

    // Join-key skew profiler: for each candidate shuffle key, the
    // max/mean imbalance in exact ppm (cross-multiplied: max·n·1e6 div
    // total) plus the top key — the pre-flight check that tells you
    // which join needs salting BEFORE it runs. One aggregate per key
    // column; per-key output is bounded by the key's cardinality.
    GraftQuery(
      "x_profile_skew",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        def skewOf(key: org.apache.spark.sql.Column, name: String) = {
          val c = ev.groupBy(key.cast("string").as("k"))
            .agg(count(lit(1)).as("c"))
          c.groupBy()
            .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("total"),
              max(col("c")).as("max_c"),
              max(struct(col("c"), col("k"))).as("top"))
            .select(lit(name).as("key_col"), col("n_keys"), col("total"),
              col("max_c"), col("top.k").as("top_key"),
              expr("(1000000 * max_c * n_keys) div total")
                .as("skew_ppm"))
        }
        skewOf(col("user_id"), "user_id")
          .unionByName(skewOf(col("event_type"), "event_type"))
      },
      Some("""WITH u AS (SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS c
                   FROM events GROUP BY 1),
             t AS (SELECT event_type AS k, count(*) AS c
                   FROM events GROUP BY 1),
             su AS (SELECT 'user_id' AS key_col,
                      CAST(count(*) AS BIGINT) AS n_keys,
                      CAST(sum(c) AS BIGINT) AS total,
                      CAST(max(c) AS BIGINT) AS max_c,
                      (SELECT k FROM u ORDER BY c DESC, k DESC LIMIT 1)
                        AS top_key
                    FROM u),
             st AS (SELECT 'event_type' AS key_col,
                      CAST(count(*) AS BIGINT) AS n_keys,
                      CAST(sum(c) AS BIGINT) AS total,
                      CAST(max(c) AS BIGINT) AS max_c,
                      (SELECT k FROM t ORDER BY c DESC, k DESC LIMIT 1)
                        AS top_key
                    FROM t),
             a AS (SELECT * FROM su UNION ALL SELECT * FROM st)
             SELECT key_col, n_keys, total, max_c, top_key,
                    (1000000 * max_c * n_keys) // total AS skew_ppm
             FROM a""")
    ),

    // New vs returning users per day: first-seen day is ONE user-keyed
    // min; the day grain then splits exactly. The growth-accounting
    // staple.
    GraftQuery(
      "x_obs_new_returning",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), expr("ts_ns div 86400000000000")
            .as("day"))
        // first-seen day as a window min over the SAME user grouping the
        // (user, day) aggregate produces — no second aggregate, no join,
        // one exchange total before the day rollup
        val seen = ev.groupBy(col("user_id"), col("day"))
          .agg(count(lit(1)).as("n_events"))
          .withColumn("first_day", min(col("day")).over(
            Window.partitionBy(col("user_id"))))
        seen
          .groupBy(col("day"))
          .agg(
            sum((col("day") === col("first_day")).cast("long"))
              .as("new_users"),
            sum((col("day") > col("first_day")).cast("long"))
              .as("returning_users"),
            sum(col("n_events")).as("n_events"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000
                     AS day
                   FROM events),
             seen AS (SELECT user_id, day, CAST(count(*) AS BIGINT)
                        AS n_events
                      FROM e GROUP BY 1, 2),
             f AS (SELECT user_id, min(day) AS first_day FROM seen
                   GROUP BY 1)
             SELECT day,
                    CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                      AS BIGINT) AS new_users,
                    CAST(sum(CASE WHEN day > first_day THEN 1 ELSE 0 END)
                      AS BIGINT) AS returning_users,
                    CAST(sum(n_events) AS BIGINT) AS n_events
             FROM seen JOIN f USING (user_id) GROUP BY 1""")
    ),

    // DAU/WAU stickiness per day: daily actives over trailing-7-day
    // actives, both exact — the weekly pane explodes map-side like the
    // sliding-distinct gate, ratio in cross-multiplied ppm.
    GraftQuery(
      "x_obs_stickiness",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), expr("ts_ns div 86400000000000")
            .as("day"))
        val dau = ev.select(col("user_id"), col("day")).distinct()
          .groupBy(col("day")).agg(count(lit(1)).as("dau"))
        val wau = ev
          .select(col("user_id"),
            explode(sequence(col("day"), col("day") + 6L, lit(1L)))
              .as("wday"))
          .distinct()
          .groupBy(col("wday").as("day")).agg(count(lit(1)).as("wau"))
        dau.join(wau, "day")
          .select(col("day"), col("dau"), col("wau"),
            expr("(1000000 * dau) div wau").as("stickiness_ppm"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000
                     AS day
                   FROM events),
             dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM
                       (SELECT DISTINCT user_id, day FROM e)
                     GROUP BY 1),
             w AS (SELECT DISTINCT user_id,
                     unnest(generate_series(day, day + 6, 1)) AS day
                   FROM e),
             wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau FROM w
                     GROUP BY 1)
             SELECT day, dau, wau,
                    (1000000 * dau) // wau AS stickiness_ppm
             FROM dau JOIN wau USING (day)""")
    ),

    // Local clustering coefficient for the 20 highest-degree non-hub
    // nodes: 2·triangles_at_v / (deg·(deg−1)) in exact ppm. Triangle
    // attribution reuses the oriented wedge close; each triangle
    // explodes to its three vertices (map-side ×3).
    GraftQuery(
      "x_graph_clustering",
      (s, dir) => {
        // the oriented relation is the session-cached fixture shared
        // with triangle counting — per run only the wedge-close and the
        // 20-row rollup execute
        val deg = GraphFixtures.plantedDegrees(s, dir)
        val oriented = GraphFixtures.orientedPlanted(s, dir)
        val o1 = oriented.select(col("u"), col("v").as("x"),
          col("dv").as("dx"))
        val o2 = oriented.select(col("u").as("u2"), col("v").as("y"),
          col("dv").as("dy"))
        val closing = oriented.select(col("u").as("cx"), col("v").as("cy"))
        val triVerts = o1.join(o2, col("u") === col("u2") &&
            (col("dx") < col("dy") ||
              (col("dx") === col("dy") && col("x") < col("y"))))
          .join(closing, col("x") === col("cx") && col("y") === col("cy"))
          .select(explode(array(col("u"), col("x"), col("y"))).as("v"))
          .groupBy(col("v")).agg(count(lit(1)).as("tri"))
        val out = deg.filter(col("dg") <= 64L).join(triVerts, "v")
          .select(col("v"), col("dg"), col("tri"),
            expr("(2000000 * tri) div (dg * (dg - 1))").as("cc_ppm"))
          .orderBy(col("dg").desc, col("v")).limit(20)
        val rows = java.util.Arrays.asList(out.collect(): _*)
        s.createDataFrame(rows, out.schema)
      },
      Some("""WITH nodes AS (SELECT doc_id AS id FROM documents),
             nn AS (SELECT count(*) AS n FROM documents),
             e0 AS (SELECT id AS s, (id * 3 + 1) % n AS d FROM nodes, nn
                    UNION ALL SELECT id, (id * 4 + 2) % n FROM nodes, nn
                    UNION ALL SELECT id, (id * 5 + 3) % n FROM nodes, nn
                    UNION ALL SELECT id, id % 13 FROM nodes),
             e AS MATERIALIZED (
                   SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                   FROM e0 WHERE s <> d),
             deg AS MATERIALIZED (
                   SELECT v, CAST(count(*) AS BIGINT) AS dg FROM
                     (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
                   GROUP BY 1),
             o AS MATERIALIZED (
                   SELECT CASE WHEN da.dg < db.dg OR
                       (da.dg = db.dg AND a < b) THEN a ELSE b END AS u,
                     CASE WHEN da.dg < db.dg OR
                       (da.dg = db.dg AND a < b) THEN b ELSE a END AS v,
                     CASE WHEN da.dg < db.dg OR
                       (da.dg = db.dg AND a < b) THEN db.dg ELSE da.dg END
                       AS dv
                   FROM e JOIN deg da ON da.v = e.a
                     JOIN deg db ON db.v = e.b),
             tri AS (SELECT o1.u, o1.x, o2.y FROM
                       (SELECT u, v AS x, dv AS dx FROM o) o1
                       JOIN (SELECT u, v AS y, dv AS dy FROM o) o2
                       USING (u)
                     WHERE (o1.dx < o2.dy OR
                        (o1.dx = o2.dy AND o1.x < o2.y))
                       AND EXISTS (SELECT 1 FROM o
                         WHERE o.u = o1.x AND o.v = o2.y)),
             tv AS (SELECT v, CAST(count(*) AS BIGINT) AS tri FROM
                      (SELECT u AS v FROM tri
                       UNION ALL SELECT x FROM tri
                       UNION ALL SELECT y FROM tri)
                    GROUP BY 1)
             SELECT deg.v, deg.dg, tv.tri,
                    (2000000 * tv.tri) // (deg.dg * (deg.dg - 1))
                      AS cc_ppm
             FROM deg JOIN tv USING (v)
             WHERE deg.dg <= 64
             ORDER BY deg.dg DESC, deg.v LIMIT 20""")
    ),

    // CUBE parity: all four (series, hour-of-day) grouping combinations
    // plus the grouping_id bitmask in one aggregate — Spark's cube()
    // against SQL GROUP BY CUBE.
    GraftQuery(
      "x_olap_cube",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn("cents", Observability.cents(col("value")))
          .select(col("event_type").as("series"),
            expr("(ts_ns div 3600000000000) % 24").as("hod"), col("cents"))
          .cube(col("series"), col("hod"))
          .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
            sum(col("cents")).as("sum_cents")),
      Some("""WITH s AS (SELECT event_type AS series,
                     (epoch_ns(ts) // 3600000000000) % 24 AS hod,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents
                   FROM events)
             SELECT series, hod,
                    CAST(grouping(series, hod) AS BIGINT) AS gid,
                    CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(cents) AS BIGINT) AS sum_cents
             FROM s GROUP BY CUBE (series, hod)""")
    ),

    // One-pass retention ladder: the 10-min/1-h/1-d rollup resolutions a
    // TSDB compacts into, produced by ONE scan via GROUPING SETS — three
    // (series, bucket) aggregates share the read and the partial-agg
    // pipeline instead of three passes.
    GraftQuery(
      "x_series_retention_ladder",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("cents", Observability.cents(col("value")))
          .select(col("event_type").as("series"),
            expr("(ts_ns div 1000 div 600000000) * 600000000").as("b10m"),
            expr("(ts_ns div 1000 div 3600000000) * 3600000000").as("b1h"),
            expr("(ts_ns div 1000 div 86400000000) * 86400000000")
              .as("b1d"),
            col("cents"))
        ev.groupingSets(
            Seq(Seq(col("series"), col("b10m")),
              Seq(col("series"), col("b1h")),
              Seq(col("series"), col("b1d"))),
            col("series"), col("b10m"), col("b1h"), col("b1d"))
          .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
            sum(col("cents")).as("sum_cents"))
      },
      Some("""WITH s AS (SELECT event_type AS series,
                     (epoch_ns(ts) // 1000 // 600000000) * 600000000
                       AS b10m,
                     (epoch_ns(ts) // 1000 // 3600000000) * 3600000000
                       AS b1h,
                     (epoch_ns(ts) // 1000 // 86400000000) * 86400000000
                       AS b1d,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents
                   FROM events)
             SELECT series, b10m, b1h, b1d,
                    CAST(grouping(series, b10m, b1h, b1d) AS BIGINT)
                      AS gid,
                    CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(cents) AS BIGINT) AS sum_cents
             FROM s GROUP BY GROUPING SETS ((series, b10m), (series, b1h),
               (series, b1d))""")
    ),

    // Bounded BFS layers from node 0 over the planted graph: per-round
    // frontier sizes (hop-distance histogram). Pregel step as
    // DataFrames; per-round localCheckpoint truncates the lineage.
    GraftQuery(
      "x_graph_bfs",
      (s, dir) => KCore.bfsLayers(GraphFixtures.plantedEdges(s, dir),
        source = 0L, rounds = 4, inputMaterialized = true),
      Some {
        val head =
          """WITH nodes AS (SELECT doc_id AS id FROM documents),
             nn AS (SELECT count(*) AS n FROM documents),
             e0x AS (SELECT id AS s, (id * 3 + 1) % n AS d FROM nodes, nn
                     UNION ALL SELECT id, (id * 4 + 2) % n FROM nodes, nn
                     UNION ALL SELECT id, (id * 5 + 3) % n FROM nodes, nn
                     UNION ALL SELECT id, id % 13 FROM nodes),
             e AS MATERIALIZED (
                   SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                   FROM e0x WHERE s <> d),
             adj AS MATERIALIZED (
                   SELECT a AS u, b AS v FROM e
                   UNION ALL SELECT b, a FROM e),
             f0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS v),
             v0 AS MATERIALIZED (SELECT v FROM f0)"""
        val hops = (1 to 4).map { r =>
          s""",
             f$r AS MATERIALIZED (
                   SELECT DISTINCT adj.v FROM adj
                   JOIN f${r - 1} ON adj.u = f${r - 1}.v
                   WHERE adj.v NOT IN (SELECT v FROM v${r - 1})),
             v$r AS MATERIALIZED (
                   SELECT v FROM v${r - 1} UNION ALL SELECT v FROM f$r)"""
        }.mkString
        val rows = (1 to 4).map { r =>
          s"""SELECT CAST($r AS BIGINT) AS round,
                (SELECT CAST(count(*) AS BIGINT) FROM f$r) AS n_frontier"""
        }.mkString("\n             UNION ALL\n             ")
        head + hops + "\n             " + rows
      }
    ),

    // Cross-source quantile normalization (score calibration): each
    // doc's n_chars maps to the GLOBAL value at the same quantile
    // (ceil(r·N/n_s)). The global order-statistics table is built
    // DISTRIBUTED — the value histogram's cumulative ranges explode
    // into (rank, value) rows (Σ widths = N, an equi-join target) —
    // never a single-partition row_number over the corpus.
    GraftQuery(
      "x_quantile_normalize",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val wSrc = Window.partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))
        val wCnt = Window.partitionBy(col("source"))
        val nAll = docs.agg(count(lit(1)).as("n_total"))
        val ranked = docs
          .withColumn("r", row_number().over(wSrc).cast("long"))
          .withColumn("n_s", count(lit(1)).over(wCnt))
          .crossJoin(broadcast(nAll))
          .withColumn("g", expr("(r * n_total + n_s - 1) div n_s"))
        val hist = graft.ops.BoundedGlobal.bounded(
          docs.groupBy(col("n_chars").as("v"))
            .agg(count(lit(1)).as("cnt")),
          "x_quantile_normalize n_chars histogram")
        val wcum = graft.ops.BoundedGlobal.cumFrame(col("v"))
        val ranks = hist.withColumn("hi", sum(col("cnt")).over(wcum))
          .select(col("v"),
            explode(sequence(col("hi") - col("cnt") + 1L, col("hi"),
              lit(1L))).as("g"))
        ranked.join(ranks, "g")
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("v").as("norm_chars"))
      },
      Some("""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
             nn AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM d),
             rk AS (SELECT doc_id, source, n_chars,
                      CAST(row_number() OVER (PARTITION BY source
                        ORDER BY n_chars, doc_id) AS BIGINT) AS r,
                      CAST(count(*) OVER (PARTITION BY source) AS BIGINT)
                        AS n_s
                    FROM d),
             gr AS (SELECT doc_id, source, n_chars,
                      (r * n_total + n_s - 1) // n_s AS g
                    FROM rk, nn),
             os AS (SELECT n_chars AS v,
                      CAST(row_number() OVER (ORDER BY n_chars, doc_id)
                        AS BIGINT) AS g
                    FROM d)
             SELECT gr.doc_id, gr.source, gr.n_chars,
                    os.v AS norm_chars
             FROM gr JOIN os USING (g)""")
    ),

    // Winsorized robust stats per series: clip at the exact p01/p99
    // cents (lower quantiles, broadcast back — bounded model state),
    // report clip counts and the clipped mean. Feature-preprocessing's
    // outlier-robust aggregate, exact end-to-end.
    GraftQuery(
      "x_series_winsorize",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("cents", Observability.cents(col("value")))
          .select(col("event_type").as("series"), col("cents"))
        val qs = graft.ops.Quantiles.groupedQuantiles(ev, col("series"),
            col("cents"), Seq(("p01", 1, 100), ("p99", 99, 100)))
          .groupBy(col("g").as("series"))
          .agg(max(when(col("q") === "p01", col("value"))).as("lo"),
            max(when(col("q") === "p99", col("value"))).as("hi"))
        ev.join(broadcast(qs), "series")
          .groupBy(col("series"))
          .agg(count(lit(1)).as("n"),
            sum((col("cents") < col("lo")).cast("long")).as("n_clip_lo"),
            sum((col("cents") > col("hi")).cast("long")).as("n_clip_hi"),
            sum(greatest(least(col("cents"), col("hi")), col("lo")))
              .as("clipped_sum"),
            max(col("lo")).as("lo"), max(col("hi")).as("hi"))
          .withColumn("clipped_mean_milli",
            expr("(clipped_sum * 1000) div n"))
      },
      Some("""WITH s AS (SELECT event_type AS series,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents
                   FROM events),
             c AS (SELECT series, cents AS v, count(*) AS cnt
                   FROM s GROUP BY 1, 2),
             cc AS (SELECT series, v,
                      sum(cnt) OVER (PARTITION BY series ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS cum,
                      sum(cnt) OVER (PARTITION BY series) AS total
                    FROM c),
             lo AS (SELECT series, min(v) AS lo FROM cc
                    WHERE cum >= (total * 1 + 99) // 100 GROUP BY 1),
             hi AS (SELECT series, min(v) AS hi FROM cc
                    WHERE cum >= (total * 99 + 99) // 100 GROUP BY 1),
             j AS (SELECT s.series, s.cents, lo.lo, hi.hi
                   FROM s JOIN lo USING (series) JOIN hi USING (series))
             SELECT series, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_clip_lo,
                    CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_clip_hi,
                    CAST(sum(greatest(least(cents, hi), lo)) AS BIGINT)
                      AS clipped_sum,
                    CAST(min(lo) AS BIGINT) AS lo,
                    CAST(min(hi) AS BIGINT) AS hi,
                    CAST((sum(greatest(least(cents, hi), lo)) * 1000)
                      // count(*) AS BIGINT) AS clipped_mean_milli
             FROM j GROUP BY 1""")
    ),

    // The SQL-replayable half of the processor_tda pipeline (the gate
    // split adjudicated in round 10): per event type, the latest 60
    // value samples, delay-embedded (m=3, tau=2), SQUARED pairwise
    // embedded distances at the 0.10/0.50/0.90 floor-index quantiles —
    // integer-exact end to end, sharing Tda.quantileIndex with the
    // homology sweep. The bar-reduction half (betti counts, best-scale
    // sweep) stays spec-gated on hand-computed fixtures in TdaSpec —
    // no SQL oracle exists for persistence.
    GraftQuery(
      "x_tda_threshold",
      (s, dir) =>
        graft.graph.Tda.tdaThresholds(Tables.events(s, dir),
          col("event_type"), col("ts_ns"),
          Observability.cents(col("value")),
          windowSize = 60, embedDim = 3, embedDelay = 2),
      Some("""WITH s AS (SELECT event_type AS g, epoch_ns(ts) AS t,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
                   FROM events),
             r AS (SELECT *, row_number() OVER
                     (PARTITION BY g ORDER BY t DESC, v DESC) AS rk
                   FROM s),
             w AS (SELECT g, t, v, row_number() OVER
                     (PARTITION BY g ORDER BY t ASC, v ASC) - 1 AS idx
                   FROM r WHERE rk <= 60),
             e AS (SELECT w0.g, w0.idx AS p, w0.v AS v0, w1.v AS v1,
                          w2.v AS v2
                   FROM w w0
                   JOIN w w1 ON w1.g = w0.g AND w1.idx = w0.idx + 2
                   JOIN w w2 ON w2.g = w0.g AND w2.idx = w0.idx + 4),
             d AS (SELECT a.g,
                          (a.v0 - b.v0) * (a.v0 - b.v0)
                            + (a.v1 - b.v1) * (a.v1 - b.v1)
                            + (a.v2 - b.v2) * (a.v2 - b.v2) AS d2
                   FROM e a JOIN e b ON a.g = b.g AND a.p < b.p),
             o AS (SELECT g, d2,
                          row_number() OVER (PARTITION BY g ORDER BY d2)
                            - 1 AS rn,
                          count(*) OVER (PARTITION BY g) AS cnt
                   FROM d),
             ne AS (SELECT g, CAST(count(*) AS BIGINT) AS n_embed
                    FROM e GROUP BY 1)
             SELECT o.g AS series, min(ne.n_embed) AS n_embed,
                    CAST(min(cnt) AS BIGINT) AS n_pairs,
                    CAST(max(CASE WHEN rn =
                        CAST(floor(0.1 * (cnt - 1)) AS BIGINT)
                      THEN d2 END) AS BIGINT) AS d2_q10,
                    CAST(max(CASE WHEN rn =
                        CAST(floor(0.5 * (cnt - 1)) AS BIGINT)
                      THEN d2 END) AS BIGINT) AS d2_q50,
                    CAST(max(CASE WHEN rn =
                        CAST(floor(0.9 * (cnt - 1)) AS BIGINT)
                      THEN d2 END) AS BIGINT) AS d2_q90
             FROM o JOIN ne ON ne.g = o.g GROUP BY 1""")
    ),

    // Degree distribution of the planted graph with a log2-bucketed
    // tail: |nodes| per exact degree for small degrees, per 2^i bucket
    // above 16 — the shape check that finds hubs before they find your
    // shuffle.
    GraftQuery(
      "x_graph_degree_dist",
      (s, dir) => {
        GraphFixtures.plantedDegrees(s, dir)
          .withColumn("bucket",
            when(col("dg") <= 16L, col("dg"))
              .otherwise(expr("32 * (1 << (length(format_string('%s', conv(dg, 10, 2))) - 5))")))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_nodes"), min(col("dg")).as("dg_min"),
            max(col("dg")).as("dg_max"))
      },
      Some("""WITH nodes AS (SELECT doc_id AS id FROM documents),
             nn AS (SELECT count(*) AS n FROM documents),
             e0 AS (SELECT id AS s, (id * 3 + 1) % n AS d FROM nodes, nn
                    UNION ALL SELECT id, (id * 4 + 2) % n FROM nodes, nn
                    UNION ALL SELECT id, (id * 5 + 3) % n FROM nodes, nn
                    UNION ALL SELECT id, id % 13 FROM nodes),
             e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                   FROM e0 WHERE s <> d),
             deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg FROM
                       (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
                     GROUP BY 1),
             b AS (SELECT dg, CASE WHEN dg <= 16 THEN dg
                     ELSE 32 * (1 << (length(format('{:b}', dg)) - 5))
                     END AS bucket
                   FROM deg)
             SELECT CAST(bucket AS BIGINT) AS bucket,
                    CAST(count(*) AS BIGINT) AS n_nodes,
                    CAST(min(dg) AS BIGINT) AS dg_min,
                    CAST(max(dg) AS BIGINT) AS dg_max
             FROM b GROUP BY 1""")
    ),

    // Seasonal-adjusted robust outliers: residual vs the hour-of-day
    // profile mean (broadcast — 24·|series| rows), then the exact
    // median/MAD/outlier chain on residuals. What "3σ from normal FOR
    // THIS HOUR" means when traffic has a daily shape.
    GraftQuery(
      "x_obs_seasonal_anomaly",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("cents", Observability.cents(col("value")))
        val prof = Timeseries.seasonalProfile(ev, col("event_type"),
          col("ts_ns"), col("cents"))
        // the median/MAD/outlier chain consumes the residual relation
        // three times — persist it once instead of re-running the scan +
        // profile join per pass
        val resid = ev
          .select(col("event_type").as("series"),
            expr("(ts_ns div 3600000000000) % 24").as("hod"),
            col("cents"))
          .join(broadcast(prof), Seq("series", "hod"))
          .select(col("series"),
            (col("cents") * 1000L - col("mean_milli")).as("resid"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        Observability.anomalyMad(resid, col("series"), col("resid"), k = 5)
      },
      Some("""WITH e AS (SELECT event_type AS series,
                     (epoch_ns(ts) // 3600000000000) % 24 AS hod,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents
                   FROM events),
             prof AS (SELECT series, hod,
                        CAST((sum(cents) * 1000) // count(*) AS BIGINT)
                          AS mean_milli
                      FROM e GROUP BY 1, 2),
             s AS (SELECT e.series AS g,
                     e.cents * 1000 - prof.mean_milli AS v
                   FROM e JOIN prof USING (series, hod)),
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
