package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Stream-processor language surface (SURVEY.md §2.1, S1–S24), expressed as
  * batch queries over the driver testdata with DuckDB oracles.
  *
  * Reference semantics: fluent-bit `src/stream_processor/flb_sp.c`,
  * grammar `src/stream_processor/parser/sql.y`. Windows here are event-time
  * (the reference uses wall-clock timers — SURVEY §7.4(2); batch event-time
  * pins deterministic semantics for the oracle).
  */
object SpQueries {

  /** 2024-01-01T00:00:00Z — epoch base for exact integer regression math. */
  private val X0 = 1704067200L

  val all: Seq[GraftQuery] = Seq(
    // S1: projection + alias + nested key lookup (flb_sp.c:1729-1797;
    // subkeys flb_sp_key.c:98-166 — here a JSON body residue path).
    GraftQuery(
      "s01_select_keys",
      (s, dir) =>
        Tables.events(s, dir).select(
          col("event_id"),
          col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("prop_k")
        ),
      Some("""SELECT event_id, event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
             FROM events""".stripMargin)
    ),

    // S4: WHERE expression tree — comparison ops, AND/OR, NULL => false
    // (flb_sp.c:828-1157).
    GraftQuery(
      "s04_where_cond",
      (s, dir) =>
        Tables.events(s, dir)
          .filter((col("value") > 100.0 && col("event_type") =!= "click") || col("user_id") < 5)
          .select(col("event_id"), col("event_type"), col("value")),
      Some("""SELECT event_id, event_type, value FROM events
             WHERE (value > 100.0 AND event_type <> 'click') OR user_id < 5""")
    ),

    // S4b: IS NULL / IS NOT NULL (sql.y:311-321) on a missing body key.
    GraftQuery(
      "s04_where_null",
      (s, dir) =>
        Tables.events(s, dir)
          .filter(get_json_object(col("props"), "$.missing").isNull &&
            get_json_object(col("props"), "$.k").isNotNull)
          .select(col("event_id")),
      Some("""SELECT event_id FROM events
             WHERE json_extract_string(props, '$.missing') IS NULL
               AND json_extract_string(props, '$.k') IS NOT NULL""")
    ),

    // S5-S8: global aggregates MIN/MAX/COUNT/SUM/AVG
    // (flb_sp_aggregate_func.c:50-205).
    GraftQuery(
      "s05_agg_global",
      (s, dir) =>
        Tables.lineitem(s, dir).agg(
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1)))
            .as("avg_qty")
        ),
      Some("""SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
             count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
             FROM lineitem""")
    ),

    // S10 + S5-S8: GROUP BY with multi-aggregate (flb_sp.c:1311-1403) —
    // the TPC-H q1 shape; WHERE runs before aggregation (flb_sp.c:1482).
    GraftQuery(
      "s10_groupby_agg",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_quantity") > 5.0)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
            sum((col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
              .cast("double").as("sum_disc_price"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_extendedprice")).as("max_price"),
            count(lit(1)).as("count_order")
          ),
      Some("""SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
             min(l_quantity) AS min_qty,
             max(l_extendedprice) AS max_price,
             count(*) AS count_order
             FROM lineitem WHERE l_quantity > 5.0
             GROUP BY l_returnflag, l_linestatus""")
    ),

    // S9: TIMESERIES_FORECAST(value, +600s) — linear regression over
    // (record-time, value) per group (flb_sp_aggregate_func.c:223-292).
    // Exact integer/decimal sums; slope/intercept derived in double from
    // identical exact operands => bit-deterministic across engines.
    GraftQuery(
      "s09_forecast",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("x", col("ts_sec") - lit(X0))
          .withColumn("y", col("value").cast("decimal(18,2)"))
        e.groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("x")).as("sx"),
            sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            max(col("x")).as("mx")
          )
          .select(
            col("event_type"),
            round(
              ((col("n").cast("double") * col("sxy").cast("double") -
                col("sx").cast("double") * col("sy").cast("double")) /
                (col("n").cast("double") * col("sxx").cast("double") -
                  col("sx").cast("double") * col("sx").cast("double"))),
              6
            ).as("slope6"),
            round(
              (col("sy").cast("double") - ((col("n").cast("double") * col("sxy").cast("double") -
                col("sx").cast("double") * col("sy").cast("double")) /
                (col("n").cast("double") * col("sxx").cast("double") -
                  col("sx").cast("double") * col("sx").cast("double"))) *
                col("sx").cast("double")) / col("n").cast("double") +
                ((col("n").cast("double") * col("sxy").cast("double") -
                  col("sx").cast("double") * col("sy").cast("double")) /
                  (col("n").cast("double") * col("sxx").cast("double") -
                    col("sx").cast("double") * col("sx").cast("double"))) *
                  (col("mx").cast("double") + 600.0),
              4
            ).as("forecast4")
          )
      },
      Some(s"""WITH b AS (
              SELECT event_type,
                     epoch_ns(ts) // 1000000000 - $X0 AS x,
                     CAST(value AS DECIMAL(18,2)) AS y
              FROM events),
            a AS (
              SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                     sum(x * y) AS sxy, sum(x * x) AS sxx, max(x) AS mx
              FROM b GROUP BY event_type),
            sl AS (
              SELECT *,
                     (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                     (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
              FROM a)
            SELECT event_type, round(slope, 6) AS slope6,
                   round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) /
                         CAST(n AS DOUBLE) +
                         slope * (CAST(mx AS DOUBLE) + 600.0), 4) AS forecast4
            FROM sl""")
    ),

    // S12: WINDOW TUMBLING(300 SECOND) — event-time variant of the
    // wall-clock timer window (flb_sp.c:513-527).
    GraftQuery(
      "s12_window_tumbling",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn("wstart", (expr("ts_ns div 300000000000") * 300).cast("long"))
          .groupBy(col("wstart"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value")
          ),
      Some("""SELECT (epoch_ns(ts) // 300000000000) * 300 AS wstart, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             FROM events GROUP BY 1, 2""")
    ),

    // S13: WINDOW HOPPING(600 SECOND, ADVANCE BY 300 SECOND) — each record
    // lands in window-count = size/advance windows (flb_sp.c:1852-2004).
    // Spark recomputes per window (no retraction needed; exact min/max,
    // unlike the reference's stale hopping min/max — SURVEY §2.1 S13).
    GraftQuery(
      "s13_window_hopping",
      (s, dir) =>
        Tables.events(s, dir)
          .withColumn("slot", explode(array(lit(0L), lit(1L))))
          .withColumn(
            "wstart",
            (expr("(ts_sec - slot * 300) div 600") * 600 + col("slot") * 300).cast("long")
          )
          .groupBy(col("wstart"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value")
          ),
      Some("""WITH slotted AS (
               SELECT e.*, t.slot,
                      ((epoch_ns(ts) // 1000000000 - t.slot * 300) // 600) * 600
                        + t.slot * 300 AS wstart
               FROM events e, (SELECT unnest(range(0, 2)) AS slot) t)
             SELECT wstart, count(*) AS n,
                    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
                    min(value) AS min_value, max(value) AS max_value
             FROM slotted GROUP BY wstart""")
    ),

    // S15: LIMIT — deterministic top-k form (SP parses LIMIT, sql.y:263-268;
    // ORDER BY is a native extension, SURVEY §2.1 dialect gaps).
    GraftQuery(
      "s15_topk",
      (s, dir) =>
        Tables.events(s, dir)
          .orderBy(col("value").desc, col("event_id").asc)
          .limit(10)
          .select(col("event_id"), col("value")),
      Some("""SELECT event_id, value FROM events
             ORDER BY value DESC, event_id ASC LIMIT 10""")
    ),

    // S3 + routing §2.8: FROM TAG:'app.err*' — fluent-bit wildcard compiled
    // to an anchored regex (flb_router.c:38-137).
    GraftQuery(
      "s03_tag_match",
      (s, dir) =>
        Tables.logEvents(s, dir)
          .filter(graft.route.Router.tagMatch(col("tag"), "app.err*"))
          .select(col("event_id"), col("tag")),
      Some("""SELECT event_id, 'app.' || event_type AS tag FROM events
             WHERE regexp_matches('app.' || event_type, '^app\.err.*$')""")
    ),

    // S18: NOW()-format applied to record time (deterministic variant of
    // flb_sp_func_time.c:40-66's "%Y-%m-%d %H:%M:%S").
    GraftQuery(
      "s18_time_format",
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("tstr")),
      Some("""SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS tstr FROM events""")
    ),

    // S19/S21: UNIX_TIMESTAMP() / RECORD_TIME() on record time
    // (flb_sp_func_time.c:68-79, flb_sp_func_record.c:50-60). Microsecond
    // resolution: DuckDB's parquet reader truncates TIMESTAMP_NS to us.
    GraftQuery(
      "s19_record_time",
      (s, dir) =>
        Tables.events(s, dir).select(
          col("event_id"),
          col("ts_sec").as("unix_ts"),
          (expr("ts_ns div 1000").cast("double") / 1e6).as("record_time")
        ),
      Some("""SELECT event_id, epoch_ns(ts) // 1000000000 AS unix_ts,
             CAST(epoch_us(ts) AS DOUBLE) / 1000000 AS record_time
             FROM events""")
    ),

    // S20: RECORD_TAG() (flb_sp_func_record.c:40-48).
    GraftQuery(
      "s20_record_tag",
      (s, dir) =>
        Tables.logEvents(s, dir)
          .groupBy(col("tag")).agg(count(lit(1)).as("n")),
      Some("""SELECT 'app.' || event_type AS tag, count(*) AS n
             FROM events GROUP BY 1""")
    ),

    // S22: @record.contains(key) (sql.y:363-368) over the JSON body residue.
    GraftQuery(
      "s22_record_contains",
      (s, dir) =>
        Tables.events(s, dir)
          .filter(get_json_object(col("props"), "$.k").isNotNull && col("value") > 150.0)
          .select(col("event_id"), col("value")),
      Some("""SELECT event_id, value FROM events
             WHERE json_extract_string(props, '$.k') IS NOT NULL AND value > 150.0""")
    )
  )
}
