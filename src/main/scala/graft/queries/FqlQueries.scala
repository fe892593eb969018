package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.Tables
import graft.sql.{FluentQL, Planner}

/** End-to-end FluentQL: SQL text → Parser → Planner → Catalyst → result,
  * checked against DuckDB. These queries exercise the *engine* (SURVEY
  * §2.1 grammar), not hand-built DataFrames.
  */
object FqlQueries {

  private def catalog(s: SparkSession, dir: String): Planner.Catalog =
    Planner.Catalog(
      streams = Map("events" -> Tables.logEvents(s, dir)),
      tagCol = "tag",
      tsSecCol = "ts_sec",
      defaultStream = Some("events")
    )

  private def fql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => FluentQL.sql(q, catalog(s, dir))

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "fql_projection",
      fql("SELECT event_id, value FROM STREAM:events WHERE value > 150.0;"),
      Some("SELECT event_id, value FROM events WHERE value > 150.0")
    ),

    GraftQuery(
      "fql_subkey",
      fql("SELECT event_id, props['k'] AS k FROM STREAM:events;"),
      Some("SELECT event_id, json_extract_string(props, '$.k') AS k FROM events")
    ),

    // string→number lazy coercion on a JSON-residue subkey
    GraftQuery(
      "fql_where_coercion",
      fql("SELECT event_id FROM STREAM:events WHERE props['k'] > 50;"),
      Some("""SELECT event_id FROM events
             WHERE TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50""")
    ),

    GraftQuery(
      "fql_agg_group",
      fql("""SELECT event_type, MIN(value) AS min_v, MAX(value) AS max_v,
            COUNT(*) AS n, SUM(user_id) AS sum_uid, AVG(user_id) AS avg_uid
            FROM STREAM:events WHERE value IS NOT NULL GROUP BY event_type;"""),
      Some("""SELECT event_type, min(value) AS min_v, max(value) AS max_v,
             count(*) AS n, CAST(sum(user_id) AS BIGINT) AS sum_uid,
             CAST(sum(user_id) AS DOUBLE) / count(*) AS avg_uid
             FROM events WHERE value IS NOT NULL GROUP BY event_type""")
    ),

    GraftQuery(
      "fql_window_tumbling",
      fql("""SELECT COUNT(*) AS n, SUM(user_id) AS su FROM STREAM:events
            WINDOW TUMBLING (300 SECOND);"""),
      Some("""SELECT (epoch_ns(ts) // 300000000000) * 300 AS wstart,
             count(*) AS n, CAST(sum(user_id) AS BIGINT) AS su
             FROM events GROUP BY 1""")
    ),

    GraftQuery(
      "fql_window_hopping",
      fql("""SELECT COUNT(*) AS n FROM STREAM:events
            WINDOW HOPPING (600 SECOND, ADVANCE BY 300 SECOND);"""),
      Some("""WITH slotted AS (
               SELECT ((epoch_ns(ts) // 1000000000 - t.slot * 300) // 600) * 600
                        + t.slot * 300 AS wstart
               FROM events e, (SELECT unnest(range(0, 2)) AS slot) t)
             SELECT wstart, count(*) AS n FROM slotted GROUP BY wstart""")
    ),

    GraftQuery(
      "fql_tag_source",
      fql("SELECT event_id, RECORD_TAG() AS tag FROM TAG:'app.err*';"),
      Some("""SELECT event_id, 'app.' || event_type AS tag FROM events
             WHERE regexp_matches('app.' || event_type, '^app\.err.*$')""")
    ),

    GraftQuery(
      "fql_contains",
      fql("""SELECT event_id FROM STREAM:events
            WHERE @record.contains(props['k']) AND value >= 200;"""),
      Some("""SELECT event_id FROM events
             WHERE json_extract_string(props, '$.k') IS NOT NULL AND value >= 200""")
    ),

    // S16: CREATE STREAM ... WITH (tag=...) — result re-tagged
    // (flb_sp_stream.c:60-152).
    GraftQuery(
      "fql_create_stream",
      fql("""CREATE STREAM alerts WITH (tag='alerts.high') AS
            SELECT event_id FROM STREAM:events WHERE value > 150.0;"""),
      Some("""SELECT event_id, 'alerts.high' AS tag FROM events
             WHERE value > 150.0""")
    ),

    // S17: FLUSH SNAPSHOT ... WHERE cond (flb_sp.c:1692-1700) — batch
    // analogue re-emits the matching buffered records.
    GraftQuery(
      "fql_flush_snapshot",
      fql("""FLUSH SNAPSHOT recent AS
            SELECT event_id, user_id FROM STREAM:events WHERE value >= 190.0;"""),
      Some("""SELECT event_id, user_id FROM events WHERE value >= 190.0""")
    ),

    GraftQuery(
      "fql_forecast",
      fql("""SELECT TIMESERIES_FORECAST(user_id, 600) AS fc FROM STREAM:events
            GROUP BY event_type;"""),
      Some("""WITH b AS (
          SELECT event_type,
                 epoch_ns(ts) // 1000000000 - 1704067200 AS x,
                 CAST(user_id AS DECIMAL(18,2)) AS y
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
        SELECT event_type,
               (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
                 + slope * (CAST(mx AS DOUBLE) + 600.0) AS fc
        FROM sl""")
    )
  )
}
