package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.obs.{Observability, Timeseries}
import graft.graph.{KCore, Triangles}

/** Behavioral / structural analytics gates: top session paths, traffic
  * concentration (Gini), bounded k-core peeling, seasonal-adjusted
  * anomalies. Compositions of the existing session, quantile, profile
  * and graph machinery — all integer-exact, all DuckDB hash-gated.
  */
object AnalyticsQueries {

  private val GapNs = 1800000000000L // 30-min session gap

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
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val nodes = docs.select(col("doc_id").as("id"))
        val n = docs.agg(count(lit(1)).as("n"))
        KCore.peel(Triangles.plantedEdges(
          nodes.crossJoin(broadcast(n)), col("id"), col("n")),
          k = 3, rounds = 5)
      },
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
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val nodes = docs.select(col("doc_id").as("id"))
        val n = docs.agg(count(lit(1)).as("n"))
        KCore.bfsLayers(Triangles.plantedEdges(
          nodes.crossJoin(broadcast(n)), col("id"), col("n")),
          source = 0L, rounds = 4)
      },
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
        val resid = ev
          .select(col("event_type").as("series"),
            expr("(ts_ns div 3600000000000) % 24").as("hod"),
            col("cents"))
          .join(broadcast(prof), Seq("series", "hod"))
          .select(col("series"),
            (col("cents") * 1000L - col("mean_milli")).as("resid"))
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
