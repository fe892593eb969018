package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.parse.Otlp

/** Round-4 ingest-edge coverage (SURVEY.md §2.5/§2.9): OTLP/HTTP logs
  * decode, RFC3164 syslog, Prometheus scrape-text parse — each gated by
  * a DuckDB oracle computed directly from the base tables, so the
  * encode→decode round trip is checked end-to-end, not parse-vs-parse.
  */
object IngestQueries {

  val all: Seq[GraftQuery] = Seq(
    // in_opentelemetry logs path (opentelemetry_logs.c:654-720): build
    // OTLP ExportLogsServiceRequest JSON bodies from `events` (one
    // resource per event_type, records carrying severity/attrs/ids),
    // then decode through Otlp.decodeLogs — the oracle recomputes the
    // flat rows straight from the table, gating the whole round trip.
    GraftQuery(
      "f_otlp_ingest",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val m4 = col("event_id") % 4
        // DuckDB reads TIMESTAMP(NANOS) truncated to micros — emit
        // micro-truncated nanos so epoch_ns(ts) parity holds
        val tns = col("ts_ns") - col("ts_ns") % 1000
        val rec = struct(
          // %5==0 records omit timeUnixNano and carry only the observed
          // time — exercising the reference's effective-timestamp rule
          when(col("event_id") % 5 =!= 0, tns.cast("string"))
            .as("timeUnixNano"),
          when(col("event_id") % 5 === 0, (tns + 1).cast("string"))
            .as("observedTimeUnixNano"),
          (lit(9) + m4).cast("int").as("severityNumber"),
          concat(lit("INFO"),
            when(m4 === 0, lit("")).otherwise((m4 + 1).cast("string")))
            .as("severityText"),
          struct(col("props").as("stringValue")).as("body"),
          array(
            struct(lit("event_id").as("key"),
              struct(col("event_id").cast("string").as("intValue")).as("value")),
            struct(lit("user_id").as("key"),
              struct(col("user_id").cast("string").as("intValue")).as("value"))
          ).as("attributes"),
          md5(col("event_id").cast("string")).as("traceId"))
        val bodies = ev.groupBy(col("event_type"))
          .agg(collect_list(rec).as("__recs"))
          .select(to_json(struct(array(struct(
            struct(array(struct(lit("service.name").as("key"),
              struct(col("event_type").as("stringValue")).as("value")))
              .as("attributes")).as("resource"),
            array(struct(
              struct(lit("graft.events").as("name"), lit("1.0").as("version"))
                .as("scope"),
              col("__recs").as("logRecords"))).as("scopeLogs")
          )).as("resourceLogs"))).as("value"))
        Otlp.decodeLogs(bodies, col("value"))
          .select(
            element_at(col("resource_attributes"), "service.name").as("service"),
            col("scope_name"),
            col("ts_unix_nano"),
            col("severity_number"),
            col("severity_text"),
            col("body"),
            element_at(col("attributes"), "event_id").cast("long").as("event_id"),
            element_at(col("attributes"), "user_id").cast("long").as("user_id"),
            col("trace_id"))
      },
      Some("""SELECT event_type AS service,
             'graft.events' AS scope_name,
             CAST(CASE WHEN event_id % 5 = 0 THEN epoch_ns(ts) + 1
                       ELSE epoch_ns(ts) END AS BIGINT) AS ts_unix_nano,
             CAST(9 + event_id % 4 AS INT) AS severity_number,
             CASE WHEN event_id % 4 = 0 THEN 'INFO'
                  ELSE 'INFO' || CAST(event_id % 4 + 1 AS VARCHAR)
             END AS severity_text,
             props AS body,
             event_id, user_id,
             md5(CAST(event_id AS VARCHAR)) AS trace_id
             FROM events""")
    )
  )
}
