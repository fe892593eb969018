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
    ),

    // OTLP PROFILES signal (v1development; the reference ingests it via
    // lib/cprofiles behind `profiles_support`, opentelemetry.c:175).
    // Deterministic synthetic stacks from `events` (depth = 1+eid%3,
    // frame i = f<type>_<(uid+i)%5>, value = cents) are packed into
    // binary ExportProfilesServiceRequest bodies — full dictionary:
    // string/function/location/stack tables with pprof index-0
    // reservations — decoded back through the wire reader, and rolled
    // up into the flame-graph self/total view. The oracle recomputes
    // the rollup straight from the table, gating the encode→decode
    // round trip end to end.
    GraftQuery(
      "f_profiles_ingest",
      (s, dir) => {
        import s.implicits._
        val typed = Tables.events(s, dir)
          .select(col("event_type"),
            col("event_id"), col("user_id"),
            graft.obs.Observability.cents(col("value")))
          .as[(String, Long, Long, Long)]
        // one profile per (type, eid%4096) shard. Profiles batch BOUNDED
        // sample sets in practice (one body per agent per flush window);
        // the modulus is the bound — a fixed tiny shard count would pack
        // the whole table into a handful of giant single-task blobs as
        // data grows (measured: modulus 8 at sf10 = ~1.5M-sample bodies,
        // 80 s; 4096 keeps bodies ~thousands of samples at any sf)
        val blobs = typed.groupByKey { case (t, eid, _, _) => (t, eid % 4096) }
          .mapGroups { (key: (String, Long), it: Iterator[(String, Long, Long, Long)]) =>
            val (t, shard) = key
            val samples = it.map { case (_, eid, uid, cents) =>
              val depth = 1 + (eid % 3).toInt
              val frames: Seq[String] =
                (0 until depth).map(i => s"f${t}_${(uid + i) % 5}")
              (frames, cents)
            }
            graft.parse.ProfilesProto.encodeProfile(
              profileId = java.security.MessageDigest.getInstance("MD5")
                .digest(s"$t/$shard".getBytes("UTF-8")),
              timeUnixNano = 0L, sampleType = "samples", unit = "count",
              period = 1L, samples = samples)
          }
        blobs.flatMap(b => graft.parse.ProfilesProto.decode(b).iterator
            .map(fs => (fs.frames, fs.value)))
          .toDF("frames", "cents")
          .select(col("cents"), posexplode(col("frames")))
          .groupBy(col("col").as("fn"))
          .agg(
            sum(when(col("pos") === 0, 1L).otherwise(0L)).as("n_samples"),
            sum(when(col("pos") === 0, col("cents")).otherwise(0L))
              .as("self_cents"),
            sum(col("cents")).as("total_cents"))
      },
      Some("""WITH e AS (SELECT event_type AS t, event_id AS eid,
                     user_id AS uid,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents
                   FROM events),
             fr AS (SELECT t, uid, cents,
                      unnest(range(0, 1 + eid % 3)) AS i FROM e)
             SELECT 'f' || t || '_' || CAST((uid + i) % 5 AS VARCHAR)
                      AS fn,
                    CAST(sum(CASE WHEN i = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_samples,
                    CAST(sum(CASE WHEN i = 0 THEN cents ELSE 0 END)
                      AS BIGINT) AS self_cents,
                    CAST(sum(cents) AS BIGINT) AS total_cents
             FROM fr GROUP BY 1""")
    ),

    // The PROTOBUF twin of f_otlp_ingest (opentelemetry_utils.c:122-155
    // accepts application/x-protobuf; opentelemetry_prot.c:964-965 gzip):
    // the same flat records are packed into binary
    // ExportLogsServiceRequest bodies (one per resource identity),
    // gzip-compressed, then decoded through the gzip + pb → proto3-JSON
    // → decodeLogs path. Same oracle as the JSON gate — both wire
    // formats must land in byte-identical rows.
    GraftQuery(
      "f_otlp_ingest_pb",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val m4 = col("event_id") % 4
        val tns = col("ts_ns") - col("ts_ns") % 1000
        val bodies = graft.parse.OtlpProto.encodeLogsPb(ev,
          resourceAttrs = map(lit("service.name"), col("event_type")),
          scopeName = lit("graft.events"), scopeVersion = lit("1.0"),
          // %5==0 records omit timeUnixNano and carry only the observed
          // time — the reference's effective-timestamp fallback rule
          tsUnixNano = when(col("event_id") % 5 =!= 0, tns),
          observedTsUnixNano = when(col("event_id") % 5 === 0, tns + 1),
          severityNumber = (lit(9) + m4).cast("int"),
          severityText = concat(lit("INFO"),
            when(m4 === 0, lit("")).otherwise((m4 + 1).cast("string"))),
          body = col("props"),
          attributes = map(lit("event_id"), col("event_id").cast("string"),
            lit("user_id"), col("user_id").cast("string")),
          traceId = md5(col("event_id").cast("string")),
          gzipBody = true,
          // size-capped bodies (exporters batch a few thousand records
          // per request) — also keeps the per-body gzip parallel across
          // cores instead of one giant body per resource
          maxRecordsPerBody = 2048)
        graft.parse.OtlpProto.decodeLogsBodies(bodies, col("body"),
            lit("application/x-protobuf"), lit("gzip"))
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
    ),

    // RFC3164 legacy BSD syslog (conf/parsers.conf `syslog-rfc3164`,
    // in_syslog/syslog_prot.c): `<pri>Mmm dd hh:mm:ss host ident[pid]:
    // message` — space-padded day, no year, optional [pid]. The oracle
    // recomputes every field (including the PRI facility/severity split
    // and the year-pinned strptime) straight from the base table, so the
    // generate→parse round trip is gated, not parse-vs-parse. Year is
    // pinned to 1972 (leap year) since 3164 timestamps carry none.
    GraftQuery(
      "parse_syslog3164",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val pri = (col("user_id") % 24) * 8 + col("event_id") % 8
        val tstr = concat(date_format(col("ts"), "MMM"), lit(" "),
          lpad(date_format(col("ts"), "d"), 2, " "), lit(" "),
          date_format(col("ts"), "HH:mm:ss"))
        val line = concat(lit("<"), pri.cast("string"), lit(">"), tstr,
          lit(" h"), (col("user_id") % 5).cast("string"), lit(" app-"),
          col("event_type"),
          when(col("event_id") % 7 =!= 0,
            concat(lit("["), col("event_id").cast("string"), lit("]")))
            .otherwise(lit("")),
          lit(": "), col("event_type"), lit(" happened #"),
          col("event_id").cast("string"))
        graft.parse.Parsers.regex(ev.select(line.as("line")), col("line"),
            graft.sources.Sources.Rfc3164Pattern,
            types = Map("pri" -> "int", "pid" -> "long"))
          .select(
            col("pri"),
            col("time"),
            unix_timestamp(
              to_timestamp(concat(lit("1972 "), regexp_replace(col("time"), " +", " ")),
                "yyyy MMM d HH:mm:ss")).as("parsed_epoch"),
            col("host"), col("ident"), col("pid"),
            expr("pri div 8").cast("int").as("facility"),
            (col("pri") % 8).cast("int").as("severity"),
            col("message"))
      },
      Some("""SELECT CAST((user_id % 24) * 8 + event_id % 8 AS INT) AS pri,
             strftime(ts, '%b') || ' ' ||
               lpad(CAST(EXTRACT(day FROM ts) AS VARCHAR), 2, ' ') || ' ' ||
               strftime(ts, '%H:%M:%S') AS time,
             CAST(floor(epoch(make_timestamp(1972,
               CAST(EXTRACT(month FROM ts) AS BIGINT),
               CAST(EXTRACT(day FROM ts) AS BIGINT),
               CAST(EXTRACT(hour FROM ts) AS BIGINT),
               CAST(EXTRACT(minute FROM ts) AS BIGINT),
               CAST(EXTRACT(second FROM ts) AS DOUBLE)))) AS BIGINT)
               AS parsed_epoch,
             'h' || CAST(user_id % 5 AS VARCHAR) AS host,
             'app-' || event_type AS ident,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_id END AS pid,
             CAST(user_id % 24 AS INT) AS facility,
             CAST(event_id % 8 AS INT) AS severity,
             event_type || ' happened #' || CAST(event_id AS VARCHAR) AS message
             FROM events""")
    ),

    // Prometheus scrape ingest (in_prometheus_scrape/prom_scrape.c):
    // expose a counter + a 2-label timestamped gauge through
    // Formats.promLine, mix in HELP/TYPE/blank lines, parse the scrape
    // body back with Parsers.promText, and emit the long-format metrics
    // frame. The oracle recomputes the frame straight from `events`, so
    // the expose→scrape round trip is gated end-to-end.
    GraftQuery(
      "parse_prom_scrape",
      (s, dir) => {
        import graft.sinks.Formats
        val ev = Tables.events(s, dir)
        val counters = ev.filter(col("value") > 100.0)
          .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
          .select(Formats.promLine("high_value_events",
            Seq("type" -> col("event_type")), col("n")).as("line"))
        val gauges = ev
          .groupBy(col("event_type"),
            concat(lit("h"), (col("user_id") % 3).cast("string")).as("host"))
          .agg(max(col("value")).as("mx"),
            expr("max(ts_ns) div 1000000").as("tsms"))
          .select(Formats.promLine("event_value_max",
            Seq("type" -> col("event_type"), "host" -> col("host")),
            col("mx"), Some(col("tsms"))).as("line"))
        val comments = s.range(1).select(
          explode(array(
            lit("# HELP high_value_events events above the value threshold"),
            lit("# TYPE high_value_events counter"),
            lit(""))).as("line"))
        val body = counters.unionAll(gauges).unionAll(comments)
        graft.parse.Parsers.promText(body, col("line"))
          .filter(col("name").isNotNull)
          .select(col("name"), posexplode(array_sort(map_entries(col("labels"))))
            .as(Seq("__p", "kv")), col("value"), col("ts_ms"))
          .select(col("name"), col("kv.key").as("label_key"),
            col("kv.value").as("label_value"), col("value"), col("ts_ms"))
      },
      Some("""WITH c AS (
               SELECT event_type, count(*) AS n
               FROM events WHERE value > 100.0 GROUP BY event_type),
             g AS (
               SELECT event_type, 'h' || CAST(user_id % 3 AS VARCHAR) AS host,
                      max(value) AS mx,
                      epoch_ns(max(ts)) // 1000000 AS tsms
               FROM events GROUP BY 1, 2)
             SELECT name, label_key, label_value, value, ts_ms FROM (
               SELECT 'high_value_events' AS name, 'type' AS label_key,
                      event_type AS label_value, CAST(n AS DOUBLE) AS value,
                      CAST(NULL AS BIGINT) AS ts_ms FROM c
               UNION ALL
               SELECT 'event_value_max', 'type', event_type, mx,
                      CAST(tsms AS BIGINT) FROM g
               UNION ALL
               SELECT 'event_value_max', 'host', host, mx,
                      CAST(tsms AS BIGINT) FROM g)""")
    ),

    // statsd ingest (in_statsd/statsd.c:155-202): build one datagram
    // line per event across all four metric types — counters/timers with
    // and without |@sample_rate, gauges with +/- incremental prefixes,
    // sets with string values — parse through Parsers.statsd, and gate
    // against an oracle that recomputes every typed field straight from
    // `events`. Values are integers so the line round trip never
    // stringifies a double.
    GraftQuery(
      "parse_statsd",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val m4 = col("event_id") % 4
        val v = (col("event_id") % 997).cast("string")
        val bucket = concat(lit("svc."), col("event_type"), lit("."),
          element_at(array(lit("count"), lit("level"), lit("timing"),
            lit("set")), (m4 + 1).cast("int")))
        val line =
          when(m4 === 0, concat(bucket, lit(":"), v, lit("|c"),
            when(col("user_id") % 2 === 0, lit("|@0.5")).otherwise(lit(""))))
          .when(m4 === 1, concat(bucket, lit(":"),
            element_at(array(lit("+"), lit("-"), lit("")),
              ((col("user_id") % 3) + 1).cast("int")), v, lit("|g")))
          .when(m4 === 2, concat(bucket, lit(":"), v, lit("|ms"),
            when(col("user_id") % 2 === 1, lit("|@0.25")).otherwise(lit(""))))
          .otherwise(concat(bucket, lit(":u"), col("user_id").cast("string"),
            lit("|s")))
        graft.parse.Parsers.statsd(ev.select(line.as("line")), col("line"))
          .select(col("bucket"), col("mtype"), col("value"),
            col("sample_rate"), col("incremental"), col("set_value"))
      },
      Some("""SELECT
             'svc.' || event_type || '.' ||
               CASE event_id % 4 WHEN 0 THEN 'count' WHEN 1 THEN 'level'
                    WHEN 2 THEN 'timing' ELSE 'set' END AS bucket,
             CASE event_id % 4 WHEN 0 THEN 'counter' WHEN 1 THEN 'gauge'
                  WHEN 2 THEN 'timer' ELSE 'set' END AS mtype,
             CASE WHEN event_id % 4 = 3 THEN NULL
                  WHEN event_id % 4 = 1 AND user_id % 3 = 1
                    THEN -CAST(event_id % 997 AS DOUBLE)
                  ELSE CAST(event_id % 997 AS DOUBLE) END AS value,
             CASE WHEN event_id % 4 = 0 THEN
                    CAST(CASE WHEN user_id % 2 = 0 THEN 0.5 ELSE 1.0 END AS DOUBLE)
                  WHEN event_id % 4 = 2 THEN
                    CAST(CASE WHEN user_id % 2 = 1 THEN 0.25 ELSE 1.0 END AS DOUBLE)
                  END AS sample_rate,
             CASE WHEN event_id % 4 = 1 THEN
                    CAST(CASE WHEN user_id % 3 IN (0, 1) THEN 1 ELSE 0 END AS BIGINT)
                  END AS incremental,
             CASE WHEN event_id % 4 = 3 THEN 'u' || CAST(user_id AS VARCHAR)
                  END AS set_value
             FROM events""")
    ),

    // Elasticsearch Bulk-API ingest (in_elasticsearch_bulk_prot.c:
    // 137-340): build real _bulk NDJSON bodies from `events` — index and
    // create pairs, update pairs (acknowledged by ES but skipped by the
    // reference's error_op gating), standalone deletes — group them into
    // one POST body per event_type, decode through Parsers.esBulk, and
    // project the @meta action fields next to the parsed document. The
    // oracle keeps exactly the index/create documents.
    GraftQuery(
      "f_es_bulk_ingest",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val m4 = col("event_id") % 4
        val opName = element_at(array(lit("index"), lit("create"),
          lit("update"), lit("delete")), (m4 + 1).cast("int"))
        val action = concat(lit("{\""), opName, lit("\":{\"_index\":\"logs-"),
          col("event_type"), lit("\",\"_id\":\""), col("event_id").cast("string"),
          lit("\"}}"))
        val doc = to_json(struct(col("event_id"), col("user_id"), col("props")))
        val frag =
          when(m4 <= 1, concat(action, lit("\n"), doc))
          .when(m4 === 2, concat(action, lit("\n"), lit("{\"doc\":"), doc, lit("}")))
          .otherwise(action)
        // requests are size-capped like real bulk posts (the reference's
        // http buffer_max_size): ~256 actions per body, many bodies in
        // parallel — the axis the decoder is designed to scale on
        val bodies = ev.groupBy(col("event_type"), expr("event_id div 256"))
          .agg(concat_ws("\n", collect_list(frag)).as("body"))
          .select(col("body"))
        graft.parse.Parsers.esBulk(bodies, col("body"))
          .select(col("write_op"),
            coalesce(get_json_object(col("meta"), "$.index._index"),
              get_json_object(col("meta"), "$.create._index")).as("index_name"),
            coalesce(get_json_object(col("meta"), "$.index._id"),
              get_json_object(col("meta"), "$.create._id"))
              .cast("long").as("doc_id"),
            from_json(col("doc"),
              org.apache.spark.sql.types.StructType.fromDDL(
                "event_id bigint, user_id bigint, props string")).as("__d"))
          .select(col("write_op"), col("index_name"), col("doc_id"),
            col("__d.event_id").as("event_id"), col("__d.user_id").as("user_id"),
            col("__d.props").as("props"))
      },
      Some("""SELECT CASE WHEN event_id % 4 = 0 THEN 'index' ELSE 'create' END
               AS write_op,
             'logs-' || event_type AS index_name,
             event_id AS doc_id, event_id, user_id, props
             FROM events WHERE event_id % 4 IN (0, 1)""")
    ),

    // Splunk HEC ingest (splunk_prot.c:347-433): build the concatenated
    // `{..}{..}` event-map stream HEC senders emit (one body per
    // sender batch), split it with the string-aware SplitJsonValues
    // scanner, and keep each map verbatim as the record body — the
    // reference does not lift time/event/fields out
    // (process_flb_log_append, splunk_prot.c:269-293). The oracle
    // recomputes the projected fields straight from `events`.
    GraftQuery(
      "f_splunk_hec_ingest",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val rec = to_json(struct(
          col("ts_sec").as("time"),
          concat(lit("h"), (col("user_id") % 7).cast("string")).as("host"),
          concat(lit("graft:"), col("event_type")).as("sourcetype"),
          struct(col("event_id"), col("user_id"), col("props")).as("event"),
          struct(lit("prod").as("env")).as("fields")))
        // size-capped posts (HEC senders batch a few hundred events per
        // request), many bodies in parallel
        val bodies = ev.groupBy(col("event_type"), expr("event_id div 256"))
          .agg(array_join(collect_list(rec), "").as("body"))
          .select(col("body"))
        graft.parse.Parsers.splunkHecEvents(bodies, col("body"))
          .select(from_json(col("record"),
            org.apache.spark.sql.types.StructType.fromDDL(
              """time bigint, host string, sourcetype string,
                 event struct<event_id: bigint, user_id: bigint, props: string>,
                 fields map<string, string>""")).as("__r"))
          .select(col("__r.time").as("time"), col("__r.host").as("host"),
            col("__r.sourcetype").as("sourcetype"),
            col("__r.event.event_id").as("event_id"),
            col("__r.event.user_id").as("user_id"),
            col("__r.event.props").as("props"),
            element_at(col("__r.fields"), "env").as("env"))
      },
      Some("""SELECT epoch_ns(ts) // 1000000000 AS time,
             'h' || CAST(user_id % 7 AS VARCHAR) AS host,
             'graft:' || event_type AS sourcetype,
             event_id, user_id, props, 'prod' AS env
             FROM events""")
    ),

    // The SINK direction of Splunk HEC (out_splunk splunk.c:500-527
    // splunk_format): flat events pack into event-endpoint JSON maps —
    // double-seconds `time`, host/source/sourcetype/index/fields
    // metadata, record under `event` — concatenated into size-capped
    // POST bodies, then re-ingested through Parsers.splunkHecEvents as
    // a true encode→decode inverse pair. The oracle recomputes the flat
    // truth straight from the table. Time survives exactly: micros are
    // integral in double seconds (0.19 µs representation error < the
    // 0.5 µs recovery threshold of floor(t·1e6 + 0.5)).
    GraftQuery(
      "sink_splunk_hec",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val tSec = (col("ts_ns") - col("ts_ns") % 1000).cast("double") / 1e9
        val rec = graft.sinks.Formats.splunkHecEvent(
          timeSec = tSec,
          host = concat(lit("h"), (col("user_id") % 5).cast("string")),
          source = concat(lit("app-"), col("event_type")),
          sourcetype = lit("graft:event"),
          index = lit("main"),
          fields = struct(lit("prod").as("env")),
          event = struct(col("event_id"), col("props")))
        val bodies = ev.groupBy(col("event_type"), expr("event_id div 256"))
          .agg(array_join(collect_list(rec), "").as("body"))
          .select(col("body"))
        graft.parse.Parsers.splunkHecEvents(bodies, col("body"))
          .select(from_json(col("record"),
            org.apache.spark.sql.types.StructType.fromDDL(
              """time double, host string, source string,
                 sourcetype string, index string,
                 fields map<string, string>,
                 event struct<event_id: bigint, props: string>""")).as("__r"))
          .select(
            floor(col("__r.time") * 1e6 + 0.5).cast("long").as("time_us"),
            col("__r.host").as("host"),
            col("__r.source").as("source"),
            col("__r.sourcetype").as("sourcetype"),
            col("__r.index").as("idx"),
            col("__r.event.event_id").as("event_id"),
            col("__r.event.props").as("props"),
            element_at(col("__r.fields"), "env").as("env"))
      },
      Some("""SELECT epoch_ns(ts) // 1000 AS time_us,
             'h' || CAST(user_id % 5 AS VARCHAR) AS host,
             'app-' || event_type AS source,
             'graft:event' AS sourcetype,
             'main' AS idx,
             event_id, props, 'prod' AS env
             FROM events""")
    ),

    // collectd network protocol (in_collectd/netprot.c): binary packets
    // (string/time/values parts, LE gauge doubles vs BE int64 counters,
    // TypesDB field-name mapping) built from `events` — two metrics per
    // event (a 1-field gauge and a 2-field derive pair) batched into
    // packets — then decoded back through the bounds-checked parser.
    // The oracle recomputes every flattened sample from the table.
    GraftQuery(
      "f_collectd_ingest",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
        val base = ev.select(col("event_id"), col("user_id"),
            col("event_type"), col("ts_sec"), col("value"))
          .as[(Long, Long, String, Long, Double)]
        val packets = base.mapPartitions { it =>
          it.grouped(50).map { chunk =>
            val ms = chunk.flatMap { case (eid, uid, et, tsec, v) =>
              Seq(
                graft.parse.Collectd.Metric(s"h${uid % 5}", et, "",
                  "gauge", "v", tsec, 10, Seq(v)),
                graft.parse.Collectd.Metric(s"h${uid % 5}", et, "",
                  "if_octets", "eth0", tsec, 10,
                  Seq(eid.toDouble, uid.toDouble)))
            }
            graft.parse.Collectd.encode(ms.toSeq)
          }
        }.toDF("body")
        graft.parse.Collectd.decodeBodies(packets, col("body"))
          .select(col("host"), col("plugin"),
            col("typ"), col("typeInstance").as("type_instance"),
            col("timeSec").cast("long").as("time_sec"),
            col("intervalSec").cast("long").as("interval_sec"),
            col("field"), col("dsType").as("ds_type"), col("value"))
      },
      Some("""SELECT 'h' || CAST(user_id % 5 AS VARCHAR) AS host,
                    event_type AS plugin, 'gauge' AS typ,
                    'v' AS type_instance,
                    epoch_ns(ts) // 1000000000 AS time_sec,
                    CAST(10 AS BIGINT) AS interval_sec,
                    'value' AS field, CAST(1 AS INT) AS ds_type, value
             FROM events
             UNION ALL
             SELECT 'h' || CAST(user_id % 5 AS VARCHAR), event_type,
                    'if_octets', 'eth0', epoch_ns(ts) // 1000000000,
                    CAST(10 AS BIGINT), 'rx', CAST(2 AS INT),
                    CAST(event_id AS DOUBLE)
             FROM events
             UNION ALL
             SELECT 'h' || CAST(user_id % 5 AS VARCHAR), event_type,
                    'if_octets', 'eth0', epoch_ns(ts) // 1000000000,
                    CAST(10 AS BIGINT), 'tx', CAST(2 AS INT),
                    CAST(user_id AS DOUBLE)
             FROM events""")
    ),

    // OTLP/HTTP metrics path (flb_opentelemetry_metrics.c:3161-3384):
    // build ExportMetricsServiceRequest bodies from `events` covering all
    // four decoded point kinds — a monotonic cumulative sum and a gauge
    // (NumberDataPoints per host label), a fixed-bound histogram, and a
    // summary whose quantiles are the exact 0/1 extremes — then decode
    // through Otlp.decodeMetrics into the long-format metrics frame. The
    // oracle recomputes every point straight from the table, gating the
    // encode→decode round trip.
    GraftQuery(
      "f_otlp_metrics_ingest",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val tns = col("ts_ns") - col("ts_ns") % 1000
        // write-side DDLs pin one struct type across all four metric
        // elements so `array()` unifies (to_json drops the null branches)
        val anyD = "struct<stringValue string>"
        val kvD = s"array<struct<key string, value $anyD>>"
        val numD = s"array<struct<attributes $kvD, timeUnixNano string, asDouble double, asInt string>>"
        val histD = "array<struct<timeUnixNano string, count string, sum double, bucketCounts array<string>, explicitBounds array<double>>>"
        val summD = "array<struct<timeUnixNano string, count string, sum double, quantileValues array<struct<quantile double, value double>>>>"
        val g = ev.groupBy(col("event_type"),
            concat(lit("h"), (col("user_id") % 3).cast("string")).as("host"))
          .agg(count(lit(1)).as("cnt"), max(col("value")).as("mx"),
            max(tns).as("tsns"))
        val hostAttrs = array(struct(lit("host").as("key"),
          struct(col("host").as("stringValue")).as("value")))
        val series = g.groupBy(col("event_type")).agg(
          collect_list(struct(hostAttrs.as("attributes"),
            col("tsns").cast("string").as("timeUnixNano"),
            lit(null).cast("double").as("asDouble"),
            col("cnt").cast("string").as("asInt"))).as("sumdps"),
          collect_list(struct(hostAttrs.as("attributes"),
            col("tsns").cast("string").as("timeUnixNano"),
            col("mx").as("asDouble"),
            lit(null).cast("string").as("asInt"))).as("gaugedps"))
        val h = ev.groupBy(col("event_type")).agg(
          count(lit(1)).as("h_cnt"),
          sum(col("value").cast("decimal(28,6)")).cast("double").as("sm"),
          min(col("value")).as("mn"), max(col("value")).as("h_mx"),
          sum(when(col("value") <= 50, 1L).otherwise(0L)).as("b1"),
          sum(when(col("value") > 50 && col("value") <= 100, 1L).otherwise(0L)).as("b2"),
          sum(when(col("value") > 100 && col("value") <= 250, 1L).otherwise(0L)).as("b3"),
          sum(when(col("value") > 250, 1L).otherwise(0L)).as("b4"),
          max(tns).as("h_tsns"))
        import org.apache.spark.sql.Column
        def metric(name: String, gauge: Column, sumc: Column,
                   hist: Column, summ: Column) = struct(
          lit(name).as("name"),
          gauge.cast(s"struct<dataPoints $numD>").as("gauge"),
          sumc.cast(s"struct<dataPoints $numD, aggregationTemporality int, isMonotonic boolean>").as("sum"),
          hist.cast(s"struct<dataPoints $histD, aggregationTemporality int>").as("histogram"),
          summ.cast(s"struct<dataPoints $summD>").as("summary"))
        val histdps = array(struct(
          col("h_tsns").cast("string").as("timeUnixNano"),
          col("h_cnt").cast("string").as("count"), col("sm").as("sum"),
          array(col("b1").cast("string"), col("b2").cast("string"),
            col("b3").cast("string"), col("b4").cast("string")).as("bucketCounts"),
          array(lit(50.0), lit(100.0), lit(250.0)).as("explicitBounds")))
        val summdps = array(struct(
          col("h_tsns").cast("string").as("timeUnixNano"),
          col("h_cnt").cast("string").as("count"), col("sm").as("sum"),
          array(struct(lit(0.0).as("quantile"), col("mn").as("value")),
            struct(lit(1.0).as("quantile"), col("h_mx").as("value")))
            .as("quantileValues")))
        val nul = lit(null)
        val bodies = series.join(h, "event_type").select(to_json(struct(
          array(struct(
            struct(array(struct(lit("service.name").as("key"),
              struct(col("event_type").as("stringValue")).as("value")))
              .as("attributes")).as("resource"),
            array(struct(
              struct(lit("graft.metrics").as("name"), lit("1.0").as("version"))
                .as("scope"),
              array(
                metric("events_total", nul,
                  struct(col("sumdps").as("dataPoints"),
                    lit(2).as("aggregationTemporality"),
                    lit(true).as("isMonotonic")), nul, nul),
                metric("event_value_max",
                  struct(col("gaugedps").as("dataPoints")), nul, nul, nul),
                metric("event_value_hist", nul, nul,
                  struct(histdps.as("dataPoints"),
                    lit(2).as("aggregationTemporality")), nul),
                metric("event_value_summary", nul, nul, nul,
                  struct(summdps.as("dataPoints")))).as("metrics")))
              .as("scopeMetrics"))).as("resourceMetrics"))).as("__body"))
        graft.parse.Otlp.decodeMetrics(bodies, col("__body"))
          .select(
            element_at(col("resource_attributes"), "service.name").as("service"),
            col("name"), col("metric_type"), col("temporality"),
            col("is_monotonic"),
            element_at(col("labels"), "host").as("host"),
            col("ts_unix_nano"),
            col("value").as("point_value"),
            col("count").as("point_count"),
            col("sum").as("point_sum"),
            element_at(col("bucket_counts"), 1).as("b1"),
            element_at(col("bucket_counts"), 2).as("b2"),
            element_at(col("bucket_counts"), 3).as("b3"),
            element_at(col("bucket_counts"), 4).as("b4"),
            element_at(col("explicit_bounds"), 3).as("bound_hi"),
            element_at(col("quantiles"), 1).getField("value").as("q_min"),
            element_at(col("quantiles"), 2).getField("value").as("q_max"))
      },
      Some(OtlpMetricsOracle)
    ),

    // The PROTOBUF twin of sink_otlp_metrics: the same flat frame packs
    // into BINARY ExportMetricsServiceRequest bodies (all four point
    // kinds, packed bucket/bound arrays) and decodes back through the
    // pb ingest path — same oracle, gating the binary round trip.
    GraftQuery(
      "sink_otlp_metrics_pb",
      (s, dir) => {
        val flat = otlpMetricsFlat(Tables.events(s, dir))
        val bodies = graft.parse.OtlpProto.encodeMetricsPb(flat,
          resourceAttrs = map(lit("service.name"), col("event_type")),
          scopeName = lit("graft.out"), scopeVersion = lit("2.0"),
          name = col("name"), metricType = col("metric_type"),
          temporality = col("temporality"),
          isMonotonic = col("is_monotonic"), labels = col("labels"),
          tsUnixNano = col("tsns"), value = col("value"),
          count = col("count"), sum = col("sum"),
          bucketCounts = col("bucket_counts"),
          explicitBounds = col("explicit_bounds"),
          quantiles = col("quantiles"))
        otlpMetricsProject(graft.parse.OtlpProto.decodeMetricsBodies(
          bodies, col("body"), lit("application/x-protobuf"), lit(null)))
      },
      Some(OtlpMetricsOracle)
    ),

    // OTLP/HTTP traces path (flb_opentelemetry_traces.c:762-897): build
    // ExportTraceServiceRequest bodies from `events` (one span per
    // event, resource per event_type; parent/traceState/events/links/
    // status branches exercised on modular slices), decode through
    // Otlp.decodeTraces into the span frame. The oracle recomputes every
    // span field straight from the table.
    GraftQuery(
      "f_otlp_traces_ingest",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val tns = col("ts_ns") - col("ts_ns") % 1000
        val span = struct(
          md5(col("user_id").cast("string")).as("traceId"),
          substring(md5(col("event_id").cast("string")), 1, 16).as("spanId"),
          when(col("event_id") % 2 === 0, lit("sampled=1")).as("traceState"),
          when(col("event_id") % 3 =!= 0,
            substring(md5(concat(lit("p"), col("user_id").cast("string"))), 1, 16))
            .as("parentSpanId"),
          col("event_type").as("name"),
          (col("event_id") % 5 + 1).cast("int").as("kind"),
          tns.cast("string").as("startTimeUnixNano"),
          (tns + (col("event_id") % 1000 + 1) * 1000000L).cast("string")
            .as("endTimeUnixNano"),
          array(
            struct(lit("event_id").as("key"),
              struct(col("event_id").cast("string").as("stringValue")).as("value")),
            struct(lit("user_id").as("key"),
              struct(col("user_id").cast("string").as("stringValue")).as("value")))
            .as("attributes"),
          when(col("event_id") % 4 === 0, array(struct(
            (tns + 500000L).cast("string").as("timeUnixNano"),
            lit("retry").as("name")))).as("events"),
          when(col("event_id") % 6 === 0, array(struct(
            md5(concat(lit("l"), col("user_id").cast("string"))).as("traceId"),
            substring(md5(concat(lit("ls"), col("event_id").cast("string"))), 1, 16)
              .as("spanId")))).as("links"),
          struct(
            when(col("event_id") % 3 === 2, lit("boom")).as("message"),
            (col("event_id") % 3).cast("int").as("code")).as("status"))
        val bodies = ev.groupBy(col("event_type"))
          .agg(collect_list(span).as("sp"))
          .select(to_json(struct(array(struct(
            struct(array(struct(lit("service.name").as("key"),
              struct(col("event_type").as("stringValue")).as("value")))
              .as("attributes")).as("resource"),
            array(struct(
              struct(lit("graft.traces").as("name"), lit("1.0").as("version"))
                .as("scope"),
              col("sp").as("spans"))).as("scopeSpans")
          )).as("resourceSpans"))).as("value"))
        graft.parse.Otlp.decodeTraces(bodies, col("value"))
          .select(
            element_at(col("resource_attributes"), "service.name").as("service"),
            col("scope_name"), col("trace_id"), col("span_id"),
            col("parent_span_id"), col("trace_state"), col("name"),
            col("kind"), col("start_unix_nano"), col("end_unix_nano"),
            element_at(col("attributes"), "event_id").cast("long").as("event_id"),
            coalesce(size(col("events")), lit(0)).as("event_count"),
            col("link_count"), col("status_code"), col("status_message"))
      },
      Some("""SELECT event_type AS service,
             'graft.traces' AS scope_name,
             md5(CAST(user_id AS VARCHAR)) AS trace_id,
             substr(md5(CAST(event_id AS VARCHAR)), 1, 16) AS span_id,
             CASE WHEN event_id % 3 <> 0
                  THEN substr(md5('p' || CAST(user_id AS VARCHAR)), 1, 16)
             END AS parent_span_id,
             CASE WHEN event_id % 2 = 0 THEN 'sampled=1' END AS trace_state,
             event_type AS name,
             CAST(event_id % 5 + 1 AS INT) AS kind,
             epoch_ns(ts) AS start_unix_nano,
             epoch_ns(ts) + (event_id % 1000 + 1) * 1000000 AS end_unix_nano,
             event_id,
             CAST(CASE WHEN event_id % 4 = 0 THEN 1 ELSE 0 END AS INT) AS event_count,
             CAST(CASE WHEN event_id % 6 = 0 THEN 1 ELSE 0 END AS INT) AS link_count,
             CAST(event_id % 3 AS INT) AS status_code,
             CASE WHEN event_id % 3 = 2 THEN 'boom' END AS status_message
             FROM events""")
    ),

    // out_opentelemetry logs delivery shape
    // (plugins/out_opentelemetry/opentelemetry_logs.c:267-300): flat
    // events encode into ExportLogsServiceRequest bodies grouped by
    // resource identity (service.name × host), then decode back through
    // Otlp.decodeLogs — the oracle recomputes the flat rows from the
    // table, gating encode→decode as a true inverse pair.
    GraftQuery(
      "sink_otlp_logs",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val tns = col("ts_ns") - col("ts_ns") % 1000
        val bodies = Otlp.encodeLogs(
          ev,
          resourceAttrs = map(
            lit("service.name"), col("event_type"),
            lit("host"), concat(lit("h"), (col("user_id") % 5).cast("string"))),
          scopeName = lit("graft.out"),
          scopeVersion = lit("2.0"),
          tsUnixNano = tns,
          severityNumber = (col("event_id") % 24 + 1).cast("int"),
          severityText = lit("S"),
          body = col("props"),
          attributes = map(lit("event_id"), col("event_id").cast("string")),
          traceId = md5(concat(lit("t"), col("event_id").cast("string"))))
          .withColumnRenamed("body", "__body")
        Otlp.decodeLogs(bodies, col("__body"))
          .select(
            element_at(col("resource_attributes"), "service.name").as("service"),
            element_at(col("resource_attributes"), "host").as("host"),
            col("scope_name"), col("scope_version"),
            col("ts_unix_nano"), col("severity_number"),
            element_at(col("attributes"), "event_id").cast("long").as("event_id"),
            col("body").as("payload"),
            col("trace_id"))
      },
      Some("""SELECT event_type AS service,
             'h' || CAST(user_id % 5 AS VARCHAR) AS host,
             'graft.out' AS scope_name, '2.0' AS scope_version,
             epoch_ns(ts) AS ts_unix_nano,
             CAST(event_id % 24 + 1 AS INT) AS severity_number,
             event_id, props AS payload,
             md5('t' || CAST(event_id AS VARCHAR)) AS trace_id
             FROM events""")
    ),

    // The PROTOBUF twin of sink_otlp_logs: the same flat frame packs
    // into BINARY ExportLogsServiceRequest bodies (out_opentelemetry's
    // default wire option) and decodes back through the pb ingest path
    // — encode→decode gated as a true inverse pair over the binary
    // format end-to-end.
    GraftQuery(
      "sink_otlp_logs_pb",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val tns = col("ts_ns") - col("ts_ns") % 1000
        val bodies = graft.parse.OtlpProto.encodeLogsPb(
          ev,
          resourceAttrs = map(
            lit("service.name"), col("event_type"),
            lit("host"), concat(lit("h"), (col("user_id") % 5).cast("string"))),
          scopeName = lit("graft.out"),
          scopeVersion = lit("2.0"),
          tsUnixNano = tns,
          observedTsUnixNano = lit(null),
          severityNumber = (col("event_id") % 24 + 1).cast("int"),
          severityText = lit("S"),
          body = col("props"),
          attributes = map(lit("event_id"), col("event_id").cast("string")),
          traceId = md5(concat(lit("t"), col("event_id").cast("string"))))
        graft.parse.OtlpProto.decodeLogsBodies(bodies, col("body"),
            lit("application/x-protobuf"), lit(null))
          .select(
            element_at(col("resource_attributes"), "service.name").as("service"),
            element_at(col("resource_attributes"), "host").as("host"),
            col("scope_name"), col("scope_version"),
            col("ts_unix_nano"), col("severity_number"),
            element_at(col("attributes"), "event_id").cast("long").as("event_id"),
            col("body").as("payload"),
            col("trace_id"))
      },
      Some("""SELECT event_type AS service,
             'h' || CAST(user_id % 5 AS VARCHAR) AS host,
             'graft.out' AS scope_name, '2.0' AS scope_version,
             epoch_ns(ts) AS ts_unix_nano,
             CAST(event_id % 24 + 1 AS INT) AS severity_number,
             event_id, props AS payload,
             md5('t' || CAST(event_id AS VARCHAR)) AS trace_id
             FROM events""")
    ),

    // out_opentelemetry metrics delivery (opentelemetry.c:38-53 pulls
    // cmt_encode_opentelemetry): a flat long-format metrics frame (all
    // four point kinds) encodes into ExportMetricsServiceRequest bodies
    // via Otlp.encodeMetrics, then decodes back through
    // Otlp.decodeMetrics — the oracle recomputes every point straight
    // from `events`, gating encode→decode as a true inverse pair.
    GraftQuery(
      "sink_otlp_metrics",
      (s, dir) => {
        val flat = otlpMetricsFlat(Tables.events(s, dir))
        val bodies = Otlp.encodeMetrics(flat,
          resourceAttrs = map(lit("service.name"), col("event_type")),
          scopeName = lit("graft.out"), scopeVersion = lit("2.0"),
          name = col("name"), metricType = col("metric_type"),
          temporality = col("temporality"),
          isMonotonic = col("is_monotonic"), labels = col("labels"),
          tsUnixNano = col("tsns"), value = col("value"),
          count = col("count"), sum = col("sum"),
          bucketCounts = col("bucket_counts"),
          explicitBounds = col("explicit_bounds"),
          quantiles = col("quantiles"))
        otlpMetricsProject(Otlp.decodeMetrics(bodies, col("body")).drop("body"))
      },
      Some(OtlpMetricsOracle)
    ),

    // The PROTOBUF twin of sink_otlp_metrics: the same flat frame packs
    // into BINARY ExportMetricsServiceRequest bodies (all four point
    // kinds, packed bucket/bound arrays) and decodes back through the
    // pb ingest path — same oracle, gating the binary round trip.
    GraftQuery(
      "sink_otlp_metrics_pb",
      (s, dir) => {
        val flat = otlpMetricsFlat(Tables.events(s, dir))
        val bodies = graft.parse.OtlpProto.encodeMetricsPb(flat,
          resourceAttrs = map(lit("service.name"), col("event_type")),
          scopeName = lit("graft.out"), scopeVersion = lit("2.0"),
          name = col("name"), metricType = col("metric_type"),
          temporality = col("temporality"),
          isMonotonic = col("is_monotonic"), labels = col("labels"),
          tsUnixNano = col("tsns"), value = col("value"),
          count = col("count"), sum = col("sum"),
          bucketCounts = col("bucket_counts"),
          explicitBounds = col("explicit_bounds"),
          quantiles = col("quantiles"))
        otlpMetricsProject(graft.parse.OtlpProto.decodeMetricsBodies(
          bodies, col("body"), lit("application/x-protobuf"), lit(null)))
      },
      Some(OtlpMetricsOracle)
    ),

    // out_opentelemetry traces delivery: a flat span frame (parent /
    // traceState / span-events / status branches on modular slices)
    // encodes into ExportTraceServiceRequest bodies via
    // Otlp.encodeTraces, then decodes back through Otlp.decodeTraces.
    // The oracle recomputes every span field straight from `events`.
    GraftQuery(
      "sink_otlp_traces",
      (s, dir) => {
        val flat = otlpTracesFlat(Tables.events(s, dir))
        val bodies = Otlp.encodeTraces(flat,
          resourceAttrs = map(lit("service.name"), col("event_type")),
          scopeName = lit("graft.out"), scopeVersion = lit("2.0"),
          traceId = col("trace_id"), spanId = col("span_id"),
          parentSpanId = col("parent_span_id"),
          traceState = col("trace_state"), name = col("name"),
          kind = col("kind"), startUnixNano = col("start_ns"),
          endUnixNano = col("end_ns"), attributes = col("attrs"),
          events = col("span_events"), statusCode = col("status_code"),
          statusMessage = col("status_message"))
        otlpTracesProject(Otlp.decodeTraces(bodies, col("body")).drop("body"))
      },
      Some(OtlpTracesOracle)
    ),

    // The PROTOBUF twin of sink_otlp_traces: the same span frame packs
    // into BINARY ExportTraceServiceRequest bodies (bytes ids, nested
    // events, status) and decodes back through the pb ingest path —
    // same oracle, gating the binary round trip.
    GraftQuery(
      "sink_otlp_traces_pb",
      (s, dir) => {
        val flat = otlpTracesFlat(Tables.events(s, dir))
        val bodies = graft.parse.OtlpProto.encodeTracesPb(flat,
          resourceAttrs = map(lit("service.name"), col("event_type")),
          scopeName = lit("graft.out"), scopeVersion = lit("2.0"),
          traceId = col("trace_id"), spanId = col("span_id"),
          parentSpanId = col("parent_span_id"),
          traceState = col("trace_state"), name = col("name"),
          kind = col("kind"), startUnixNano = col("start_ns"),
          endUnixNano = col("end_ns"), attributes = col("attrs"),
          events = col("span_events"), statusCode = col("status_code"),
          statusMessage = col("status_message"))
        otlpTracesProject(graft.parse.OtlpProto.decodeTracesBodies(
          bodies, col("body"), lit("application/x-protobuf"), lit(null)))
      },
      Some(OtlpTracesOracle)
    ),

    // out_loki push bodies (plugins/out_loki/loki.c:1656-1795
    // pack_payload): records stream-grouped by their label set (stream
    // identity = the label map, loki.c's label_keys from record
    // accessors), values as ["<ts nanos>","<line>"] pairs with
    // line_format=json. The body is built by Formats.lokiPush, then
    // parsed back via from_json + explodes; the oracle recomputes every
    // field straight from `events`, gating the build→parse round trip.
    GraftQuery(
      "sink_loki",
      (s, dir) => {
        import graft.sinks.Formats
        val ev = Tables.events(s, dir)
        val tns = col("ts_ns") - col("ts_ns") % 1000
        val line = Formats.jsonLine(Seq(
          "event_id" -> col("event_id"), "user_id" -> col("user_id"),
          "props" -> col("props")))
        val bodies = ev
          .groupBy(col("event_type"),
            concat(lit("h"), (col("user_id") % 5).cast("string")).as("host"))
          .agg(collect_list(Formats.lokiValue(tns, line)).as("__entries"))
          .select(Formats.lokiPush(Seq(
            "job" -> lit("graft"), "type" -> col("event_type"),
            "host" -> col("host")), col("__entries")).as("__body"))
        val schema = org.apache.spark.sql.types.DataType.fromDDL(
          """streams array<struct<stream map<string,string>,
               values array<array<string>>>>""")
        bodies
          .select(explode(from_json(col("__body"), schema)
            .getField("streams")).as("__s"))
          .select(col("__s.stream").as("__labels"),
            explode(col("__s.values")).as("__v"))
          .select(
            element_at(col("__labels"), "job").as("job"),
            element_at(col("__labels"), "type").as("service"),
            element_at(col("__labels"), "host").as("host"),
            element_at(col("__v"), 1).cast("long").as("ts_unix_nano"),
            from_json(element_at(col("__v"), 2),
              org.apache.spark.sql.types.StructType.fromDDL(
                "event_id bigint, user_id bigint, props string")).as("__r"))
          .select(col("job"), col("service"), col("host"),
            col("ts_unix_nano"), col("__r.event_id").as("event_id"),
            col("__r.user_id").as("user_id"), col("__r.props").as("props"))
      },
      Some("""SELECT 'graft' AS job, event_type AS service,
             'h' || CAST(user_id % 5 AS VARCHAR) AS host,
             epoch_ns(ts) AS ts_unix_nano,
             event_id, user_id, props
             FROM events""")
    ),

    // out_prometheus_remote_write (remote_write.c:141-186): the metrics
    // frame serializes into snappy WriteRequest protobuf wire bytes via
    // RemoteWriteSink.encodeBatch, then decodes back through the ingest
    // side's PromRemoteWrite.decodeBodies — encode→compress→uncompress→
    // decode gated as a true inverse pair; the oracle recomputes the
    // frame straight from `events`.
    GraftQuery(
      "sink_remote_write",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
        val g = ev.groupBy(col("event_type"),
            concat(lit("h"), (col("user_id") % 3).cast("string")).as("host"))
          .agg(count(lit(1)).as("cnt"), max(col("value")).as("mx"),
            expr("max(ts_ns) div 1000000").as("tsms"))
        val flat = g.select(lit("events_total").as("name"),
            col("event_type"), col("host"),
            col("cnt").cast("double").as("value"), col("tsms"))
          .unionByName(g.select(lit("event_value_max").as("name"),
            col("event_type"), col("host"), col("mx").as("value"),
            col("tsms")))
        // wire-format codecs are JVM functions, not Columns — a typed
        // mapPartitions batches series into real request bodies (the
        // same bounded-batch shape the sink POSTs)
        val bodies = flat.as[(String, String, String, Double, Long)]
          .mapPartitions { it =>
            it.grouped(64).map { grp =>
              graft.sinks.RemoteWriteSink.encodeBatch(grp.map {
                case (n, t, h, v, ts) =>
                  (n, Map("type" -> t, "host" -> h), v, ts)
              })
            }
          }.toDF("body")
        graft.parse.PromRemoteWrite.decodeBodies(bodies, col("body"))
          .select(col("name"),
            element_at(col("labels"), "type").as("service"),
            element_at(col("labels"), "host").as("host"),
            col("value"), col("ts_ms"))
      },
      Some("""WITH g AS (
               SELECT event_type, 'h' || CAST(user_id % 3 AS VARCHAR) AS host,
                      count(*) AS cnt, max(value) AS mx,
                      epoch_ns(max(ts)) // 1000000 AS tsms
               FROM events GROUP BY 1, 2)
             SELECT name, service, host, value, ts_ms FROM (
               SELECT 'events_total' AS name, event_type AS service, host,
                      CAST(cnt AS DOUBLE) AS value,
                      CAST(tsms AS BIGINT) AS ts_ms FROM g
               UNION ALL
               SELECT 'event_value_max', event_type, host, mx,
                      CAST(tsms AS BIGINT) FROM g)""")
    ),

    // out_datadog intake body (datadog.c:221-340 datadog_format, key
    // names datadog.h:28-35): flat events render through
    // Formats.datadogEvent, batch into the JSON-array body one POST
    // carries, then parse back via from_json + explode — the oracle
    // recomputes every field straight from `events`, gating the body
    // builder end-to-end.
    GraftQuery(
      "sink_datadog",
      (s, dir) => {
        import graft.sinks.Formats
        val ev = Tables.events(s, dir)
        val rec = Formats.datadogEvent(
          timestampMs = expr("ts_ns div 1000000"),
          source = lit("graft"),
          service = col("event_type"),
          hostname = concat(lit("h"), (col("user_id") % 7).cast("string")),
          tags = concat(lit("env:prod,team:"), col("event_type")),
          message = col("props"))
        val bodies = ev.groupBy(col("event_type"), expr("event_id div 256"))
          .agg(concat(lit("["), array_join(collect_list(rec), ","), lit("]"))
            .as("body"))
          .select(col("body"))
        val schema = org.apache.spark.sql.types.DataType.fromDDL(
          """array<struct<timestamp bigint, ddsource string, service string,
               hostname string, ddtags string, message string>>""")
        bodies.select(explode(from_json(col("body"), schema)).as("__r"))
          .select(col("__r.timestamp").as("ts_ms"),
            col("__r.ddsource").as("ddsource"),
            col("__r.service").as("service"),
            col("__r.hostname").as("hostname"),
            col("__r.ddtags").as("ddtags"),
            col("__r.message").as("message"))
      },
      Some("""SELECT epoch_ns(ts) // 1000000 AS ts_ms,
             'graft' AS ddsource, event_type AS service,
             'h' || CAST(user_id % 7 AS VARCHAR) AS hostname,
             'env:prod,team:' || event_type AS ddtags,
             props AS message
             FROM events""")
    ),

    // out_influxdb line protocol (influxdb.c:120-260): measurement +
    // escaped tag set + integer/quoted-string fields + ns timestamp.
    // Tag values carry a space to exercise the backslash escaping; the
    // oracle rebuilds every line with replace()-based escaping.
    GraftQuery(
      "sink_influx",
      (s, dir) => {
        import graft.sinks.Formats
        val ev = Tables.events(s, dir)
        val tns = col("ts_ns") - col("ts_ns") % 1000
        ev.select(col("event_id"),
          Formats.influxLine("events",
            tags = Seq(
              "type" -> col("event_type"),
              // embedded space must escape: `h 0` → `h\ 0`
              "host" -> concat(lit("h "), (col("user_id") % 3).cast("string"))),
            intFields = Seq("event_id" -> col("event_id"),
              "user_id" -> col("user_id")),
            strFields = Seq("props" -> col("props")),
            tsNs = tns).as("line"))
      },
      Some("""SELECT event_id,
             'events,type=' || event_type ||
             ',host=h\ ' || CAST(user_id % 3 AS VARCHAR) ||
             ' event_id=' || CAST(event_id AS VARCHAR) || 'i' ||
             ',user_id=' || CAST(user_id AS VARCHAR) || 'i' ||
             ',props="' || replace(replace(props, '\', '\\'), '"', '\"') ||
             '" ' || CAST(epoch_ns(ts) AS VARCHAR) AS line
             FROM events""")
    ),

    // out_syslog RFC5424 render (syslog.c:229-370): `<pri>1 TIMESTAMP
    // host app procid msgid - msg`, microsecond UTC timestamp, `-` NIL
    // values on modular slices. Rendered lines then PARSE back through
    // our own RFC5424 parser (the in_syslog side), gating the
    // render→parse inverse pair; the oracle recomputes the flat fields.
    GraftQuery(
      "sink_syslog",
      (s, dir) => {
        import graft.sinks.Formats
        val ev = Tables.events(s, dir)
        val line = Formats.syslog5424Line(
          facility = (col("user_id") % 24).cast("int"),
          severity = (col("event_id") % 8).cast("int"),
          ts = col("ts"),
          host = concat(lit("h"), (col("user_id") % 5).cast("string")),
          appname = concat(lit("app-"), col("event_type")),
          procid = when(col("event_id") % 7 =!= 0,
            col("event_id").cast("string")),
          msgid = when(col("event_id") % 3 === 0, lit("EV")),
          message = concat(col("event_type"), lit(" #"),
            col("event_id").cast("string")))
        graft.parse.Parsers.regex(ev.select(line.as("line")), col("line"),
            graft.sources.Sources.Rfc5424Pattern,
            types = Map("pri" -> "int", "pid" -> "long"))
          .select(col("pri"),
            expr("pri div 8").cast("int").as("facility"),
            (col("pri") % 8).cast("int").as("severity"),
            col("host"), col("ident").as("appname"),
            col("pid").as("procid"),
            // `-` is the RFC NILVALUE, not a literal msgid
            when(col("msgid") =!= "-", col("msgid")).as("msgid"),
            col("message"))
      },
      Some("""SELECT CAST((user_id % 24) * 8 + event_id % 8 AS INT) AS pri,
             CAST(user_id % 24 AS INT) AS facility,
             CAST(event_id % 8 AS INT) AS severity,
             'h' || CAST(user_id % 5 AS VARCHAR) AS host,
             'app-' || event_type AS appname,
             CASE WHEN event_id % 7 <> 0 THEN event_id END AS procid,
             CASE WHEN event_id % 3 = 0 THEN 'EV' END AS msgid,
             event_type || ' #' || CAST(event_id AS VARCHAR) AS message
             FROM events""")
    ),

    // out_s3 key templating (s3.c s3_key_format, flb_get_s3_key at
    // src/aws/flb_aws_util.c:1065-1208): $TAG / $TAG[n] / strftime
    // specifiers render per record as a codegen Column — the oracle
    // recomputes every object key with strftime straight from `events`,
    // gating the template engine the object-store sink partitions by.
    GraftQuery(
      "sink_s3_keys",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val tag = concat(lit("app."), col("event_type"))
        ev.select(tag.as("tag"),
          graft.sinks.ObjectStoreSink.renderKey(
            "/graft-logs/$TAG/%Y/%m/%d/%H/$TAG[1]-%M%S.jsonl",
            tag, col("ts")).as("object_key"),
          col("event_id"))
      },
      Some("""SELECT 'app.' || event_type AS tag,
             '/graft-logs/app.' || event_type || '/' ||
               strftime(ts, '%Y/%m/%d/%H') || '/' || event_type || '-' ||
               strftime(ts, '%M%S') || '.jsonl' AS object_key,
             event_id
             FROM events""")
    ),

    // Blob event class (VERDICT r13 gap #4; src/flb_input_blob.c +
    // out_azure_blob's block-list commit): file-reference records
    // delivered in ordered 256-unit parts, sink commits the part list.
    // The chunk schedule is a codegen'd sequence+explode (map-only —
    // at 100 TB the parts never shuffle; only the tiny per-blob
    // manifest rows do, one exchange). The oracle re-derives every
    // part boundary, per-part digest, and the ordered
    // digest-of-digests commit.
    GraftQuery(
      "f_blob_delivery",
      (s, dir) => {
        import graft.sources.Blob
        val blobs = Tables.documents(s, dir)
          .select(col("doc_id").as("blob_id"), col("text"),
            length(col("text")).as("blob_len"))
        val parts = Blob.chunkPlan(blobs, col("blob_len"), 256L)
        Blob.commitManifest(parts, "blob_id",
            md5(Blob.textPayload(parts, col("text")).cast("binary")))
          .withColumn("delivered_len", col("delivered_len").cast("long"))
      },
      Some("""WITH exploded AS (
               SELECT doc_id AS blob_id, text,
                      unnest(generate_series(0,
                        CAST(ceil(length(text) / 256.0) AS BIGINT) - 1))
                        AS part_idx
               FROM documents),
             parts AS (
               SELECT blob_id, part_idx,
                      md5(substring(text, CAST(part_idx * 256 + 1 AS BIGINT),
                                    256)) AS digest,
                      least(256, length(text) - part_idx * 256) AS len
               FROM exploded)
             SELECT blob_id, count(*) AS n_parts,
                    CAST(sum(len) AS BIGINT) AS delivered_len,
                    md5(string_agg(digest, '' ORDER BY part_idx))
                      AS blocklist_md5
             FROM parts GROUP BY blob_id""")
    )
  )

  /** The four-kind long-format metrics frame both sink_otlp_metrics
    * variants (JSON and protobuf) encode — one `sum` + one `gauge`
    * point per (event_type, host), one `histogram` + one `summary` per
    * event_type.
    */
  private def otlpMetricsFlat(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tns = col("ts_ns") - col("ts_ns") % 1000
    val g = ev.groupBy(col("event_type"),
        concat(lit("h"), (col("user_id") % 3).cast("string")).as("host"))
      .agg(count(lit(1)).as("cnt"), max(col("value")).as("mx"),
        max(tns).as("tsns"))
    val h = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("cnt"),
      sum(col("value").cast("decimal(28,6)")).cast("double").as("sm"),
      min(col("value")).as("mn"), max(col("value")).as("mx"),
      sum(when(col("value") <= 50, 1L).otherwise(0L)).as("b1"),
      sum(when(col("value") > 50 && col("value") <= 100, 1L).otherwise(0L)).as("b2"),
      sum(when(col("value") > 100 && col("value") <= 250, 1L).otherwise(0L)).as("b3"),
      sum(when(col("value") > 250, 1L).otherwise(0L)).as("b4"),
      max(tns).as("tsns"))
    val nulLong = lit(null).cast("bigint")
    val nulDbl = lit(null).cast("double")
    val nulBuckets = lit(null).cast("array<bigint>")
    val nulBounds = lit(null).cast("array<double>")
    val nulQuant =
      lit(null).cast("array<struct<quantile double, value double>>")
    g.select(col("event_type"),
        lit("events_total").as("name"), lit("sum").as("metric_type"),
        lit(2).as("temporality"), lit(true).as("is_monotonic"),
        map(lit("host"), col("host")).as("labels"), col("tsns"),
        col("cnt").cast("double").as("value"), nulLong.as("count"),
        nulDbl.as("sum"), nulBuckets.as("bucket_counts"),
        nulBounds.as("explicit_bounds"), nulQuant.as("quantiles"))
      .unionByName(g.select(col("event_type"),
        lit("event_value_max").as("name"), lit("gauge").as("metric_type"),
        lit(null).cast("int").as("temporality"),
        lit(null).cast("boolean").as("is_monotonic"),
        map(lit("host"), col("host")).as("labels"), col("tsns"),
        col("mx").as("value"), nulLong.as("count"), nulDbl.as("sum"),
        nulBuckets.as("bucket_counts"), nulBounds.as("explicit_bounds"),
        nulQuant.as("quantiles")))
      .unionByName(h.select(col("event_type"),
        lit("event_value_hist").as("name"),
        lit("histogram").as("metric_type"), lit(2).as("temporality"),
        lit(null).cast("boolean").as("is_monotonic"),
        map().cast("map<string,string>").as("labels"), col("tsns"),
        nulDbl.as("value"), col("cnt").as("count"), col("sm").as("sum"),
        array(col("b1"), col("b2"), col("b3"), col("b4"))
          .as("bucket_counts"),
        array(lit(50.0), lit(100.0), lit(250.0)).as("explicit_bounds"),
        nulQuant.as("quantiles")))
      .unionByName(h.select(col("event_type"),
        lit("event_value_summary").as("name"),
        lit("summary").as("metric_type"),
        lit(null).cast("int").as("temporality"),
        lit(null).cast("boolean").as("is_monotonic"),
        map().cast("map<string,string>").as("labels"), col("tsns"),
        nulDbl.as("value"), col("cnt").as("count"), col("sm").as("sum"),
        nulBuckets.as("bucket_counts"), nulBounds.as("explicit_bounds"),
        array(struct(lit(0.0).as("quantile"), col("mn").as("value")),
          struct(lit(1.0).as("quantile"), col("mx").as("value")))
          .as("quantiles")))
  }

  /** Shared oracle-facing projection of the decoded metrics frame. */
  private def otlpMetricsProject(decoded: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    decoded.select(
      element_at(col("resource_attributes"), "service.name").as("service"),
      col("name"), col("metric_type"), col("temporality"),
      col("is_monotonic"),
      element_at(col("labels"), "host").as("host"),
      col("ts_unix_nano"),
      col("value").as("point_value"),
      col("count").as("point_count"),
      col("sum").as("point_sum"),
      element_at(col("bucket_counts"), 1).as("b1"),
      element_at(col("bucket_counts"), 2).as("b2"),
      element_at(col("bucket_counts"), 3).as("b3"),
      element_at(col("bucket_counts"), 4).as("b4"),
      element_at(col("explicit_bounds"), 3).as("bound_hi"),
      element_at(col("quantiles"), 1).getField("value").as("q_min"),
      element_at(col("quantiles"), 2).getField("value").as("q_max"))

  private def OtlpMetricsOracle: String = """WITH g AS (
               SELECT event_type, 'h' || CAST(user_id % 3 AS VARCHAR) AS host,
                      count(*) AS cnt, max(value) AS mx,
                      max(epoch_ns(ts)) AS tsns
               FROM events GROUP BY 1, 2),
             h AS (
               SELECT event_type, count(*) AS cnt,
                      CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sm,
                      min(value) AS mn, max(value) AS mx,
                      CAST(sum(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
                      CAST(sum(CASE WHEN value > 50 AND value <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
                      CAST(sum(CASE WHEN value > 100 AND value <= 250 THEN 1 ELSE 0 END) AS BIGINT) AS b3,
                      CAST(sum(CASE WHEN value > 250 THEN 1 ELSE 0 END) AS BIGINT) AS b4,
                      max(epoch_ns(ts)) AS tsns
               FROM events GROUP BY 1)
             SELECT event_type AS service, 'events_total' AS name,
                    'sum' AS metric_type, CAST(2 AS INT) AS temporality,
                    TRUE AS is_monotonic, host, tsns AS ts_unix_nano,
                    CAST(cnt AS DOUBLE) AS point_value,
                    CAST(NULL AS BIGINT) AS point_count,
                    CAST(NULL AS DOUBLE) AS point_sum,
                    CAST(NULL AS BIGINT) AS b1, CAST(NULL AS BIGINT) AS b2,
                    CAST(NULL AS BIGINT) AS b3, CAST(NULL AS BIGINT) AS b4,
                    CAST(NULL AS DOUBLE) AS bound_hi,
                    CAST(NULL AS DOUBLE) AS q_min, CAST(NULL AS DOUBLE) AS q_max
             FROM g
             UNION ALL
             SELECT event_type, 'event_value_max', 'gauge',
                    CAST(NULL AS INT), CAST(NULL AS BOOLEAN), host, tsns,
                    mx, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL
             FROM g
             UNION ALL
             SELECT event_type, 'event_value_hist', 'histogram',
                    CAST(2 AS INT), CAST(NULL AS BOOLEAN),
                    CAST(NULL AS VARCHAR), tsns, CAST(NULL AS DOUBLE),
                    cnt, sm, b1, b2, b3, b4, CAST(250.0 AS DOUBLE),
                    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
             FROM h
             UNION ALL
             SELECT event_type, 'event_value_summary', 'summary',
                    CAST(NULL AS INT), CAST(NULL AS BOOLEAN),
                    CAST(NULL AS VARCHAR), tsns, CAST(NULL AS DOUBLE),
                    cnt, sm, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
                    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
                    CAST(NULL AS DOUBLE), mn, mx
             FROM h"""

  /** The span frame both sink_otlp_traces variants encode — parent /
    * traceState / span-events / status branch on modular slices of
    * `events`.
    */
  private def otlpTracesFlat(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tns = col("ts_ns") - col("ts_ns") % 1000
    ev.select(col("event_type"),
      md5(col("user_id").cast("string")).as("trace_id"),
      substring(md5(col("event_id").cast("string")), 1, 16).as("span_id"),
      when(col("event_id") % 3 =!= 0,
        substring(md5(concat(lit("p"), col("user_id").cast("string"))), 1, 16))
        .as("parent_span_id"),
      when(col("event_id") % 2 === 0, lit("sampled=1")).as("trace_state"),
      col("event_type").as("name"),
      (col("event_id") % 5 + 1).cast("int").as("kind"),
      tns.as("start_ns"),
      (tns + (col("event_id") % 1000 + 1) * 1000000L).as("end_ns"),
      map(lit("event_id"), col("event_id").cast("string"),
        lit("user_id"), col("user_id").cast("string")).as("attrs"),
      when(col("event_id") % 4 === 0, array(struct(
        (tns + 500000L).as("ts_unix_nano"), lit("retry").as("name"),
        map(lit("attempt"), lit("2")).as("attributes")))).as("span_events"),
      (col("event_id") % 3).cast("int").as("status_code"),
      when(col("event_id") % 3 === 2, lit("boom")).as("status_message"))
  }

  /** Shared oracle-facing projection of the decoded span frame. */
  private def otlpTracesProject(decoded: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    decoded.select(
      element_at(col("resource_attributes"), "service.name").as("service"),
      col("scope_name"), col("trace_id"), col("span_id"),
      col("parent_span_id"), col("trace_state"), col("name"),
      col("kind"), col("start_unix_nano"), col("end_unix_nano"),
      element_at(col("attributes"), "event_id").cast("long").as("event_id"),
      coalesce(size(col("events")), lit(0)).as("event_count"),
      element_at(col("events"), 1).getField("name").as("first_event_name"),
      element_at(element_at(col("events"), 1).getField("attributes"),
        "attempt").as("first_event_attempt"),
      col("status_code"), col("status_message"))

  private def OtlpTracesOracle: String = """SELECT event_type AS service,
             'graft.out' AS scope_name,
             md5(CAST(user_id AS VARCHAR)) AS trace_id,
             substr(md5(CAST(event_id AS VARCHAR)), 1, 16) AS span_id,
             CASE WHEN event_id % 3 <> 0
                  THEN substr(md5('p' || CAST(user_id AS VARCHAR)), 1, 16)
             END AS parent_span_id,
             CASE WHEN event_id % 2 = 0 THEN 'sampled=1' END AS trace_state,
             event_type AS name,
             CAST(event_id % 5 + 1 AS INT) AS kind,
             epoch_ns(ts) AS start_unix_nano,
             epoch_ns(ts) + (event_id % 1000 + 1) * 1000000 AS end_unix_nano,
             event_id,
             CAST(CASE WHEN event_id % 4 = 0 THEN 1 ELSE 0 END AS INT) AS event_count,
             CASE WHEN event_id % 4 = 0 THEN 'retry' END AS first_event_name,
             CASE WHEN event_id % 4 = 0 THEN '2' END AS first_event_attempt,
             CAST(event_id % 3 AS INT) AS status_code,
             CASE WHEN event_id % 3 = 2 THEN 'boom' END AS status_message
             FROM events"""
}
