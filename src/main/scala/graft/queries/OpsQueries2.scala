package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ops._
import graft.sinks.Formats

/** Second wave of filter/processor/sink coverage (SURVEY.md §2.3/§2.4/
  * §2.10): throttle_size, alter_size, expect, parser-filter, labels,
  * tail sampling, OTel envelope, snapshot/flush, record-accessor tag
  * parts, out_file serialization formats, GELF, Prometheus exposition —
  * each with a DuckDB oracle.
  */
object OpsQueries2 {

  val all: Seq[GraftQuery] = Seq(
    // filter_throttle_size (throttle_size.c:659): cumulative bytes per
    // (key, pane) capped — running sum over a key-local order.
    GraftQuery(
      "f_throttle_size",
      // Admit-only semantics (throttle_size.c:360-433): a dropped
      // record's bytes do NOT count toward the window total, so later
      // smaller records can still be admitted. The synthetic variable
      // size (props length + event_id%40) with a 60-byte cap makes the
      // cap genuinely bind (~43% dropped, ~300 rows differ from a
      // cumulative running sum at sf0.01). Oracle = the same sequential
      // ledger as a recursive CTE over per-pane ranks.
      (s, dir) =>
        ThrottleSize(
          Tables.events(s, dir),
          keyCols = Seq(col("event_type")),
          tsSecCol = col("ts_sec"),
          orderCols = Seq(col("ts_ns"), col("event_id")),
          sizeCol = length(col("props")) + col("event_id") % 40,
          paneSeconds = 3600L,
          maxBytes = 60L
        ).select(col("event_id"), col("event_type")),
      Some("""WITH RECURSIVE ranked AS (
               SELECT event_id, event_type,
                      coalesce(length(props), 0) + event_id % 40 AS sz,
                      (epoch_ns(ts) // 1000000000) // 3600 AS pane,
                      row_number() OVER (
                        PARTITION BY event_type, (epoch_ns(ts) // 1000000000) // 3600
                        ORDER BY epoch_ns(ts), event_id) AS rn
               FROM events),
             walk AS (
               SELECT event_id, event_type, pane, rn, sz,
                      CASE WHEN sz <= 60 THEN sz ELSE 0 END AS tot,
                      (sz <= 60) AS admit
               FROM ranked WHERE rn = 1
               UNION ALL
               SELECT r.event_id, r.event_type, r.pane, r.rn, r.sz,
                      w.tot + CASE WHEN w.tot + r.sz <= 60 THEN r.sz ELSE 0 END,
                      (w.tot + r.sz <= 60)
               FROM ranked r JOIN walk w
                 ON r.event_type = w.event_type AND r.pane = w.pane
                AND r.rn = w.rn + 1)
             SELECT event_id, event_type FROM walk WHERE admit""")
    ),

    // filter_alter_size (alter_size.c:91): keep first-N per chunk (≙ key
    // group with total order).
    GraftQuery(
      "f_alter_size",
      (s, dir) =>
        AlterSize.head(
          Tables.events(s, dir),
          keyCols = Seq(col("event_type")),
          orderCols = Seq(col("ts_ns"), col("event_id")),
          n = 3
        ).select(col("event_id"), col("event_type")),
      Some("""SELECT event_id, event_type FROM (
               SELECT event_id, event_type,
                      row_number() OVER (
                        PARTITION BY event_type
                        ORDER BY epoch_ns(ts), event_id) AS rn
               FROM events) WHERE rn <= 3""")
    ),

    // filter_expect (expect.c:398): per-rule violation counts (the
    // assertion/data-quality operator).
    GraftQuery(
      "f_expect",
      (s, dir) =>
        Expect.violations(
          Tables.orders(s, dir),
          Seq(
            "orderkey_exists" -> col("o_orderkey").isNotNull,
            "status_known" -> col("o_orderstatus").isin("O", "F", "P"),
            "priority_has_dash" -> col("o_orderpriority").contains("-")
          )),
      Some("""SELECT 'orderkey_exists' AS rule,
             CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS violations FROM orders
             UNION ALL
             SELECT 'status_known',
             CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'), false)
                      THEN 1 ELSE 0 END) AS BIGINT) FROM orders
             UNION ALL
             SELECT 'priority_has_dash',
             CAST(sum(CASE WHEN NOT coalesce(contains(o_orderpriority, '-'), false)
                      THEN 1 ELSE 0 END) AS BIGINT) FROM orders""")
    ),

    // filter_parser (filter_parser.c:174): re-parse a field, reserve_data
    // off (drop unparsed fields), preserve_key on (keep the source).
    GraftQuery(
      "f_parser_filter",
      (s, dir) => {
        val raw = Tables.events(s, dir).withColumn(
          "line", concat(lit("lvl="), col("event_type"),
            lit(" id="), col("event_id")))
        ParserFilter.regex(raw, "line", "^lvl=(?<lvl>\\w+) id=(?<pid>\\d+)$",
          reserveData = false, preserveKey = true,
          types = Map("pid" -> "long"))
      },
      Some("""WITH raw AS (
               SELECT 'lvl=' || event_type || ' id=' || CAST(event_id AS VARCHAR)
                        AS line FROM events)
             SELECT line,
                    regexp_extract(line, '^lvl=(\w+) id=(\d+)$', 1) AS lvl,
                    TRY_CAST(regexp_extract(line, '^lvl=(\w+) id=(\d+)$', 2)
                             AS BIGINT) AS pid
             FROM raw""")
    ),

    // processor_labels (labels.c): insert + upsert + delete + hash over a
    // label map, verified in exploded long form.
    GraftQuery(
      "p_labels",
      (s, dir) => {
        val base = Tables.events(s, dir).withColumn("labels",
          map(lit("type"), col("event_type"),
            lit("user"), col("user_id").cast("string")))
        val done = base
          .withColumn("labels", Labels.insert(col("labels"), "env", lit("prod")))
          .withColumn("labels", Labels.upsert(col("labels"), "region", lit("us")))
          .withColumn("labels", Labels.delete(col("labels"), "user"))
          .withColumn("labels", Labels.hash(col("labels"), "type"))
        Labels.explodeSorted(done, col("labels"), Seq(col("event_id")))
      },
      Some("""SELECT event_id, 'env' AS label_key, 'prod' AS label_value FROM events
             UNION ALL SELECT event_id, 'region', 'us' FROM events
             UNION ALL SELECT event_id, 'type', sha256(event_type) FROM events""")
    ),

    // processor_sampling tail mode (sampling_cond_latency.c /
    // sampling_cond_status_code.c): keep whole traces where any span
    // breaches the policy; trace ≙ user_id, span latency ≙ value.
    GraftQuery(
      "p_sampling_tail",
      (s, dir) =>
        TailSampling.keepMatchingTraces(
          Tables.events(s, dir),
          traceId = col("user_id"),
          spanCond = TailSampling.latencyPolicy(col("value"), 195.0) ||
            col("event_type") === "error"
        ).select(col("event_id"), col("user_id")),
      Some("""SELECT event_id, user_id FROM events
             WHERE user_id IN (SELECT DISTINCT user_id FROM events
                               WHERE value >= 195.0 OR event_type = 'error')""")
    ),

    // processor_opentelemetry_envelope (otel_envelope.c): wrap into
    // resource/scope/record grouping, then unwrap; the envelope is also
    // serialized to check the nesting shape.
    GraftQuery(
      "p_otel_envelope",
      (s, dir) => {
        val wrapped = OtelEnvelope.wrap(
          Tables.events(s, dir),
          resourceAttrs = Seq(
            "service" -> lit("graft"),
            "host" -> concat(lit("h"), (col("user_id") % 3).cast("string"))),
          scopeName = "app",
          bodyCols = Seq("event_id", "event_type"))
        OtelEnvelope.unwrap(wrapped, "envelope")
          .withColumn("envelope_json",
            to_json(struct(
              struct(col("resource_service").as("service"),
                col("resource_host").as("host")).as("resource"),
              struct(lit("app").as("name")).as("scope"),
              struct(col("event_id"), col("event_type")).as("record"))))
      },
      Some("""SELECT 'graft' AS resource_service,
             'h' || CAST(user_id % 3 AS VARCHAR) AS resource_host,
             event_id, event_type,
             to_json(struct_pack(
               resource := struct_pack(service := 'graft',
                 host := 'h' || CAST(user_id % 3 AS VARCHAR)),
               scope := struct_pack(name := 'app'),
               record := struct_pack(event_id := event_id,
                 event_type := event_type))) AS envelope_json
             FROM events""")
    ),

    // CREATE SNAPSHOT / FLUSH (flb_sp_snapshot.c, flb_sp.c:1692-1700)
    // batch analogue: last-5 ring buffer per tag, flushed at each key's
    // latest record matching the WHERE.
    GraftQuery(
      "s17_snapshot_flush",
      (s, dir) =>
        Snapshot.flush(
          Tables.events(s, dir),
          keyCols = Seq(col("event_type")),
          orderCol = col("event_id"),
          n = 5,
          cond = col("value") > 195.0
        ).select(col("event_id"), col("event_type")),
      Some("""WITH f AS (
               SELECT event_type,
                      max(event_id) FILTER (WHERE value > 195.0) AS flush_at
               FROM events GROUP BY event_type)
             SELECT event_id, event_type FROM (
               SELECT e.event_id, e.event_type,
                      row_number() OVER (PARTITION BY e.event_type
                                         ORDER BY e.event_id DESC) AS rnk
               FROM events e JOIN f USING (event_type)
               WHERE f.flush_at IS NOT NULL AND e.event_id <= f.flush_at)
             WHERE rnk <= 5""")
    ),

    // filter_sysinfo (sysinfo.c:175) / filter_aws (aws.c:956): append a
    // static host/environment snapshot as constant columns (the IMDS
    // fetch happens once at startup in the reference; here the snapshot
    // is plan-time literals — constant-folded, zero per-row cost).
    GraftQuery(
      "f_sysinfo",
      (s, dir) =>
        Enrich.staticFields(Tables.events(s, dir), Seq(
          "hostname" -> lit("graft-node-1"),
          "os_name" -> lit("linux"),
          "az" -> lit("us-east-1a"),
          "instance_id" -> lit("i-0abc123")))
          .select(col("event_id"), col("hostname"), col("os_name"),
            col("az"), col("instance_id")),
      Some("""SELECT event_id, 'graft-node-1' AS hostname, 'linux' AS os_name,
             'us-east-1a' AS az, 'i-0abc123' AS instance_id FROM events""")
    ),

    // filter_ecs (ecs.c:1447): per-record task/container metadata join —
    // broadcast dim keyed by the container hash, fact side never
    // shuffles (same plan shape PlanSpec pins for kubernetes).
    GraftQuery(
      "f_ecs_metadata",
      (s, dir) => {
        val dim = Tables.nation(s, dir).select(
          col("n_nationkey").as("container_group"),
          concat(lit("cluster-"), col("n_name")).as("ecs_cluster"),
          concat(lit("arn:task/"), col("n_name")).as("ecs_task_arn"))
        Enrich.metadataJoin(
          Tables.events(s, dir).withColumn("container_group", col("user_id") % 25),
          dim, Seq("container_group"),
          select = Seq("ecs_cluster" -> "cluster", "ecs_task_arn" -> "task_arn"))
          .select(col("event_id"), col("cluster"), col("task_arn"))
      },
      Some("""SELECT e.event_id,
             'cluster-' || n.n_name AS cluster,
             'arn:task/' || n.n_name AS task_arn
             FROM events e LEFT JOIN nation n ON e.user_id % 25 = n.n_nationkey""")
    ),

    // Record accessor $TAG / $TAG[n] (ra.y; tag part split at
    // record_accessor.c patterns): dot-separated tag parts.
    GraftQuery(
      "ra_tag_parts",
      (s, dir) => {
        val le = Tables.logEvents(s, dir)
        le.select(col("event_id"),
          graft.route.Router.tagPart(col("tag"), 0).as("tag0"),
          graft.route.Router.tagPart(col("tag"), 1).as("tag1"))
      },
      Some("""SELECT event_id,
             string_split('app.' || event_type, '.')[1] AS tag0,
             string_split('app.' || event_type, '.')[2] AS tag1
             FROM events""")
    ),

    // flb_ra_translate template with ${ENV} interpolation + $TAG[n] +
    // missing-key-renders-empty (ra.l/ra.y; record_accessor.c
    // cb_translate). Env expands at plan time, exactly like the
    // reference resolves ${...} when the accessor is created — the
    // oracle bakes in the same value.
    GraftQuery(
      "ra_env_template",
      (s, dir) => {
        val le = Tables.logEvents(s, dir)
        le.select(col("event_id"),
          graft.route.RecordAccessor.translate(le,
            "svc=${SERVICE}/$TAG[1] ev=$event_type#$event_id none=[$missing]",
            env = Map("SERVICE" -> "graft").get).as("line"))
      },
      Some("""SELECT event_id,
             'svc=graft/' || event_type || ' ev=' || event_type || '#' ||
             CAST(event_id AS VARCHAR) || ' none=[]' AS line FROM events""")
    ),

    // out_file formats json/csv/ltsv/template (file.c:472-580,987-1020).
    GraftQuery(
      "sink_file_formats",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.select(
          col("o_orderkey"),
          Formats.jsonLine(Seq(
            "k" -> col("o_orderkey"), "st" -> col("o_orderstatus"))).as("json_line"),
          Formats.csvLine(Seq(
            col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))).as("csv_line"),
          Formats.ltsvLine(Seq(
            "k" -> col("o_orderkey"), "st" -> col("o_orderstatus"))).as("ltsv_line"),
          Formats.templateLine("order {k} is {st}",
            Map("k" -> col("o_orderkey"), "st" -> col("o_orderstatus"))).as("tpl_line"))
      },
      Some("""SELECT o_orderkey,
             to_json(struct_pack(k := o_orderkey, st := o_orderstatus)) AS json_line,
             CAST(o_orderkey AS VARCHAR) || ',' || o_orderstatus || ',' ||
               o_orderpriority AS csv_line,
             'k:' || CAST(o_orderkey AS VARCHAR) || chr(9) || 'st:' ||
               o_orderstatus AS ltsv_line,
             'order ' || CAST(o_orderkey AS VARCHAR) || ' is ' || o_orderstatus
               AS tpl_line
             FROM orders""")
    ),

    // GELF mapping (src/flb_pack_gelf.c): version/host/short_message/
    // timestamp/level + _-prefixed extras.
    GraftQuery(
      "sink_gelf",
      (s, dir) => {
        val le = Tables.logEvents(s, dir)
        le.select(col("event_id"),
          Formats.gelf(
            host = col("tag"),
            shortMessage = col("event_type"),
            timestampSec = col("ts_sec"),
            level = when(col("event_type") === "error", lit(3)).otherwise(lit(6)),
            additional = Seq("user" -> col("user_id"))).as("gelf"))
      },
      Some("""SELECT event_id,
             to_json(struct_pack(
               version := '1.1',
               host := 'app.' || event_type,
               short_message := event_type,
               "timestamp" := epoch_ns(ts) // 1000000000,
               level := CASE WHEN event_type = 'error' THEN 3 ELSE 6 END,
               _user := user_id)) AS gelf
             FROM events""")
    ),

    // Prometheus text exposition (out_prometheus_exporter): counter lines
    // from log_to_metrics output.
    GraftQuery(
      "sink_prom_text",
      (s, dir) => {
        val counters = LogToMetrics.counter(
          Tables.events(s, dir),
          matchCond = col("value") > 100.0,
          labels = Seq(col("event_type")),
          name = "high_value_events")
        counters.select(
          col("event_type"),
          Formats.promLine("high_value_events",
            Seq("type" -> col("event_type")), col("value")).as("line"))
      },
      Some("""SELECT event_type,
             'high_value_events{type="' || event_type || '"} ' ||
               CAST(count(*) AS VARCHAR) AS line
             FROM events WHERE value > 100.0 GROUP BY event_type""")
    ),

    // filter_multiline CRI partial mode (flb_ml_parser_cri.c): runs of
    // P(artial) lines closed by an F(inal) line concatenate without
    // separators; incomplete trailing runs are marked.
    GraftQuery(
      "f_multiline_cri",
      (s, dir) => {
        val lines = Tables.events(s, dir).select(
          col("user_id"), col("event_id"),
          when(col("event_id") % 3 === 2, lit("F")).otherwise(lit("P")).as("flag"),
          substring(col("event_type"), 1, 3).as("chunk"))
        graft.streaming.Multiline.assembleCriBatch(
          lines, Seq("user_id"), "event_id", "flag", "chunk")
      },
      Some("""WITH lines AS (
               SELECT user_id, event_id,
                      CASE WHEN event_id % 3 = 2 THEN 'F' ELSE 'P' END AS flag,
                      substr(event_type, 1, 3) AS chunk
               FROM events),
             g AS (
               SELECT *, coalesce(count(*) FILTER (WHERE flag = 'F') OVER (
                 PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS grp
               FROM lines)
             SELECT user_id, min(event_id) AS first_event_id,
                    count(*) AS n_parts,
                    string_agg(chunk, '' ORDER BY event_id) AS message,
                    CAST(max(CASE WHEN flag = 'F' THEN 1 ELSE 0 END) AS BIGINT)
                      AS complete
             FROM g GROUP BY user_id, grp""")
    ),

    // Docker multiline mode (flb_ml_parser_docker.c): JSON log lines;
    // a `log` value ending in \n completes the record (ENDSWITH rule),
    // partials concatenate; grouped by (key, stream) — stream is the
    // reference's key_group.
    GraftQuery(
      "f_multiline_docker",
      (s, dir) => {
        val lines = Tables.events(s, dir).select(
          col("user_id"), col("event_id"),
          concat(lit("{\"log\": \""), substring(col("event_type"), 1, 3),
            when(col("event_id") % 3 === 2, lit("\\n")).otherwise(lit("")),
            lit("\", \"stream\": \""),
            when(col("event_id") % 2 === 0, lit("stdout")).otherwise(lit("stderr")),
            lit("\"}")).as("jline"))
        graft.streaming.Multiline.assembleDockerBatch(
          lines, Seq("user_id"), "event_id", "jline")
      },
      Some("""WITH lines AS (
               SELECT user_id, event_id,
                      '{"log": "' || substr(event_type, 1, 3) ||
                      CASE WHEN event_id % 3 = 2 THEN '\n' ELSE '' END ||
                      '", "stream": "' ||
                      CASE WHEN event_id % 2 = 0 THEN 'stdout' ELSE 'stderr' END ||
                      '"}' AS jline
               FROM events),
             parsed AS (
               SELECT user_id, event_id,
                      json_extract_string(jline, '$.log') AS log,
                      json_extract_string(jline, '$.stream') AS stream,
                      CASE WHEN json_extract_string(jline, '$.log')
                           LIKE '%' || chr(10) THEN 1 ELSE 0 END AS fin
               FROM lines),
             g AS (
               SELECT *, coalesce(sum(fin) OVER (
                 PARTITION BY user_id, stream ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS grp
               FROM parsed)
             SELECT user_id, stream, min(event_id) AS first_event_id,
                    count(*) AS n_parts,
                    string_agg(log, '' ORDER BY event_id) AS message,
                    CAST(max(fin) AS BIGINT) AS complete
             FROM g GROUP BY user_id, stream, grp""")
    ),

    // Ruby multiline mode (flb_ml_parser_ruby.c rules): `  from
    // path:NN:in ...` frames continue the exception line above them.
    GraftQuery(
      "f_multiline_ruby",
      (s, dir) => {
        val lines = Tables.events(s, dir).select(
          col("user_id"), col("event_id"),
          when(col("value") > 100,
            concat(lit("app.rb:"), col("event_id"), lit(":in `handle'")))
            .otherwise(concat(lit("  from lib/job.rb:"), col("event_id"),
              lit(":in `call'"))).as("line"))
        graft.streaming.Multiline.assembleBatch(
          lines, Seq("user_id"), "event_id", "line",
          graft.streaming.Multiline.Modes.ruby)
      },
      Some("""WITH lines AS (
               SELECT user_id, event_id,
                      CASE WHEN value > 100
                           THEN 'app.rb:' || CAST(event_id AS VARCHAR) || ':in `handle'''
                           ELSE '  from lib/job.rb:' || CAST(event_id AS VARCHAR) || ':in `call''' END AS line
               FROM events),
             g AS (
               SELECT *, sum(CASE WHEN NOT regexp_matches(line,
                                    '^\s+from\s+.*:\d+:in\s+')
                                  THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY event_id) AS grp
               FROM lines)
             SELECT user_id, min(event_id) AS first_event_id, count(*) AS n_lines,
                    string_agg(line, chr(10) ORDER BY event_id) AS message
             FROM g GROUP BY user_id, grp""")
    ),

    // Python traceback multiline mode (flb_ml_parser_python.c rules
    // re-expressed): `Traceback (most recent call last):` OPENS a
    // record (start-state rule — it must not continue the previous
    // one); `  File ...` frames and `SomeError: ...` terminators
    // continue it; a plain log line starts its own record.
    GraftQuery(
      "f_multiline_python",
      (s, dir) => {
        val m4 = col("event_id") % 4
        val lines = Tables.events(s, dir).select(
          col("user_id"), col("event_id"),
          when(m4 === 0, lit("Traceback (most recent call last):"))
            .when(m4 === 1, concat(lit("  File \"app.py\", line "),
              col("event_id"), lit(", in run")))
            .when(m4 === 2, concat(lit("ValueError: bad input "),
              col("event_id")))
            .otherwise(concat(lit("INFO request done "), col("event_id")))
            .as("line"))
        graft.streaming.Multiline.assembleBatch(
          lines, Seq("user_id"), "event_id", "line",
          graft.streaming.Multiline.Modes.python)
      },
      Some("""WITH lines AS (
               SELECT user_id, event_id,
                      CASE WHEN event_id % 4 = 0
                             THEN 'Traceback (most recent call last):'
                           WHEN event_id % 4 = 1
                             THEN '  File "app.py", line ' || CAST(event_id AS VARCHAR) || ', in run'
                           WHEN event_id % 4 = 2
                             THEN 'ValueError: bad input ' || CAST(event_id AS VARCHAR)
                           ELSE 'INFO request done ' || CAST(event_id AS VARCHAR) END AS line
               FROM events),
             g AS (
               SELECT *, sum(CASE WHEN NOT regexp_matches(line,
                                    '^(\s+|[A-Za-z_.]*(Error|Exception))')
                                  THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY event_id) AS grp
               FROM lines)
             SELECT user_id, min(event_id) AS first_event_id, count(*) AS n_lines,
                    string_agg(line, chr(10) ORDER BY event_id) AS message
             FROM g GROUP BY user_id, grp""")
    ),

    // Go panic multiline mode (flb_ml_parser_go.c rules re-expressed):
    // `panic:` opens a record; `goroutine N [running]:`, indented
    // frames and `file.go:NN` source lines continue it.
    GraftQuery(
      "f_multiline_go",
      (s, dir) => {
        val m4 = col("event_id") % 4
        val lines = Tables.events(s, dir).select(
          col("user_id"), col("event_id"),
          when(m4 === 0, concat(lit("panic: index out of range ["),
            col("event_id"), lit("]")))
            .when(m4 === 1, lit("goroutine 7 [running]:"))
            .when(m4 === 2, concat(lit("main.go:"), col("event_id"),
              lit(" +0x1a")))
            .otherwise(concat(lit("listening on :8080 "), col("event_id")))
            .as("line"))
        graft.streaming.Multiline.assembleBatch(
          lines, Seq("user_id"), "event_id", "line",
          graft.streaming.Multiline.Modes.go)
      },
      Some("""WITH lines AS (
               SELECT user_id, event_id,
                      CASE WHEN event_id % 4 = 0
                             THEN 'panic: index out of range [' || CAST(event_id AS VARCHAR) || ']'
                           WHEN event_id % 4 = 1
                             THEN 'goroutine 7 [running]:'
                           WHEN event_id % 4 = 2
                             THEN 'main.go:' || CAST(event_id AS VARCHAR) || ' +0x1a'
                           ELSE 'listening on :8080 ' || CAST(event_id AS VARCHAR) END AS line
               FROM events),
             g AS (
               SELECT *, sum(CASE WHEN NOT regexp_matches(line,
                                    '^(goroutine |\s+|\S+\.go:)')
                                  THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY event_id) AS grp
               FROM lines)
             SELECT user_id, min(event_id) AS first_event_id, count(*) AS n_lines,
                    string_agg(line, chr(10) ORDER BY event_id) AS message
             FROM g GROUP BY user_id, grp""")
    ),

    // filter_lua with a REAL user script (lua.c:433-616) executed by
    // the in-repo interpreter (ops/Lua.scala): per-record callback
    // drops 'click' events (code -1), uppercases, doubles an id
    // through tonumber/tostring, rewrites via a Lua-pattern gsub, and
    // shifts the timestamp. The oracle recomputes every output column
    // in SQL, gating the whole script execution path.
    GraftQuery(
      "f_lua_script",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val in = ev.select(
          lit("app.events").as("tag"),
          expr("ts_ns div 1000000000").as("ts"),
          map(
            lit("event_type"), col("event_type"),
            lit("event_id"), col("event_id").cast("string")).as("body"))
        val script =
          """function cb_filter(tag, timestamp, record)
            |  if record["event_type"] == "click" then
            |    return -1, timestamp, record
            |  end
            |  record["upper_type"] = string.upper(record["event_type"])
            |  record["double_id"] = tostring(tonumber(record["event_id"]) * 2)
            |  record["starred"] = string.gsub(record["event_type"], "[aeiou]", "*")
            |  return 1, timestamp + 1, record
            |end""".stripMargin
        graft.ops.LuaContract.applyToFrame(s, in, "tag", "ts", "body")(
          graft.ops.LuaContract.script(script))
          .select(
            col("tag"),
            col("ts").as("ts_sec"),
            element_at(col("body"), "event_id").cast("long").as("event_id"),
            element_at(col("body"), "upper_type").as("upper_type"),
            element_at(col("body"), "double_id").as("double_id"),
            element_at(col("body"), "starred").as("starred"))
      },
      Some("""SELECT 'app.events' AS tag,
             epoch_ns(ts) // 1000000000 + 1 AS ts_sec,
             event_id,
             upper(event_type) AS upper_type,
             CAST(event_id * 2 AS VARCHAR) AS double_id,
             regexp_replace(event_type, '[aeiou]', '*', 'g') AS starred
             FROM events WHERE event_type <> 'click'""")
    ),

    // cmetrics summary type (lib/cmetrics cmetrics.h:26-30): exact
    // quantiles per label set — Spark `percentile` ≙ DuckDB
    // quantile_cont (both exact linear interpolation; rounded to kill
    // last-ulp formula differences).
    GraftQuery(
      "p_metrics_summary",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(
            round(percentile(col("value"), lit(0.25)), 6).as("p25"),
            round(percentile(col("value"), lit(0.5)), 6).as("p50"),
            round(percentile(col("value"), lit(0.9)), 6).as("p90"),
            count(lit(1)).as("n")),
      Some("""SELECT event_type,
             round(quantile_cont(value, 0.25), 6) AS p25,
             round(quantile_cont(value, 0.5), 6) AS p50,
             round(quantile_cont(value, 0.9), 6) AS p90,
             count(*) AS n
             FROM events GROUP BY event_type""")
    ),

    // log_to_metrics gauge mode (log_to_metrics.h:44-46).
    GraftQuery(
      "f_log_to_metrics_gauge",
      (s, dir) =>
        LogToMetrics.gauge(
          Tables.events(s, dir),
          matchCond = col("event_type") =!= "click",
          valueCol = col("value"),
          labels = Seq(col("event_type")),
          name = "peak_value"
        ),
      Some("""SELECT event_type, max(value) AS value,
             'peak_value' AS metric_name, 'gauge' AS metric_type
             FROM events WHERE event_type <> 'click' GROUP BY event_type""")
    )
  )
}
