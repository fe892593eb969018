package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.sinks.Formats

/** The SaaS delivery body shapes (SURVEY.md §2.10 long tail): CloudWatch
  * PutLogEvents, Cloud Logging entries.write, LogDNA ingest, BigQuery
  * insertAll — each gated as a build→parse round trip whose oracle
  * recomputes the flat truth straight from `events`. All four ride the
  * proven [[graft.sinks.HttpSink]] transport; what each service needs is
  * exactly its body builder in [[Formats]].
  */
object SaasQueries {

  private val PayloadDdl = "event_id bigint, props string"

  val all: Seq[GraftQuery] = Seq(

    // out_cloudwatch_logs (cloudwatch_api.c:440-560): one PutLogEvents
    // body per (logGroup, logStream), events chronologically sorted,
    // millisecond timestamps.
    GraftQuery(
      "sink_cloudwatch",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val msg = Formats.jsonLine(Seq(
          "event_id" -> col("event_id"), "props" -> col("props")))
        val bodies = ev
          .groupBy(concat(lit("g-"), col("event_type")).as("grp"),
            concat(lit("s"), (col("user_id") % 3).cast("string")).as("strm"))
          .agg(collect_list(
            // integer div: a double detour would round 1.7e18 ns to a
            // 256 ns ulp and land ±1 ms off the oracle's epoch_ns//1e6
            Formats.cloudwatchEvent(expr("ts_ns div 1000000"), msg))
            .as("evs"))
          .select(Formats.cloudwatchBody(col("grp"), col("strm"),
            col("evs")).as("body"))
        bodies
          .select(from_json(col("body"),
            org.apache.spark.sql.types.StructType.fromDDL(
              s"""logGroupName string, logStreamName string,
                  logEvents array<struct<timestamp: bigint, message: string>>"""))
            .as("r"))
          .select(col("r.logGroupName").as("log_group"),
            col("r.logStreamName").as("log_stream"),
            explode(col("r.logEvents")).as("e"))
          .select(col("log_group"), col("log_stream"),
            col("e.timestamp").as("ts_ms"),
            from_json(col("e.message"),
              org.apache.spark.sql.types.StructType.fromDDL(PayloadDdl))
              .as("m"))
          .select(col("log_group"), col("log_stream"), col("ts_ms"),
            col("m.event_id").as("event_id"), col("m.props").as("props"))
      },
      Some("""SELECT 'g-' || event_type AS log_group,
             's' || CAST(user_id % 3 AS VARCHAR) AS log_stream,
             epoch_ns(ts) // 1000000 AS ts_ms,
             event_id, props
             FROM events""")
    ),

    // out_stackdriver (stackdriver.c:1728-1830): entries.write bodies —
    // logName projects/<project>/logs/<tag>, mapped severity, RFC3339
    // timestamp, residual fields under jsonPayload.
    GraftQuery(
      "sink_stackdriver",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val sev = element_at(
          array(lit("DEBUG"), lit("INFO"), lit("WARNING"), lit("ERROR")),
          (col("event_id") % 4 + 1).cast("int"))
        val entry = Formats.stackdriverEntry(
          logName = concat(lit("projects/graft/logs/"), col("event_type")),
          severity = sev,
          ts = col("ts"),
          jsonPayload = struct(col("event_id"), col("props")))
        val bodies = ev.groupBy(col("event_type"))
          .agg(collect_list(entry).as("es"))
          .select(Formats.stackdriverBody(col("es")).as("body"))
        bodies
          .select(explode(from_json(col("body"),
            org.apache.spark.sql.types.DataType.fromDDL(
              s"""struct<entries: array<struct<logName string,
                  severity string, timestamp string,
                  jsonPayload struct<event_id bigint, props string>>>>"""))
            .getField("entries")).as("e"))
          .select(col("e.logName").as("log_name"),
            col("e.severity").as("severity"),
            // RFC3339 micro-precision timestamp → epoch micros
            unix_micros(to_timestamp(col("e.timestamp"),
              "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")).as("ts_us"),
            col("e.jsonPayload.event_id").as("event_id"),
            col("e.jsonPayload.props").as("props"))
      },
      Some("""SELECT 'projects/graft/logs/' || event_type AS log_name,
             CASE CAST(event_id % 4 AS INT)
                  WHEN 0 THEN 'DEBUG' WHEN 1 THEN 'INFO'
                  WHEN 2 THEN 'WARNING' ELSE 'ERROR' END AS severity,
             epoch_ns(ts) // 1000 AS ts_us,
             event_id, props
             FROM events""")
    ),

    // out_logdna (logdna.c:200-280): {"lines":[{timestamp (int seconds),
    // app, level, line}]} — promoted keys + the residual record JSON.
    GraftQuery(
      "sink_logdna",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val line = Formats.jsonLine(Seq(
          "event_id" -> col("event_id"), "props" -> col("props")))
        val lvl = element_at(
          array(lit("info"), lit("warn"), lit("error")),
          (col("event_id") % 3 + 1).cast("int"))
        val bodies = ev.groupBy(col("event_type"))
          .agg(collect_list(Formats.logdnaLine(col("ts_sec"),
            concat(lit("app-"), col("event_type")), lvl, line)).as("ls"))
          .select(Formats.logdnaBody(col("ls")).as("body"))
        bodies
          .select(explode(from_json(col("body"),
            org.apache.spark.sql.types.DataType.fromDDL(
              s"""struct<lines: array<struct<timestamp bigint, app string,
                  level string, line string>>>""")).getField("lines"))
            .as("l"))
          .select(col("l.timestamp").as("ts_sec"), col("l.app").as("app"),
            col("l.level").as("level"),
            from_json(col("l.line"),
              org.apache.spark.sql.types.StructType.fromDDL(PayloadDdl))
              .as("m"))
          .select(col("ts_sec"), col("app"), col("level"),
            col("m.event_id").as("event_id"), col("m.props").as("props"))
      },
      Some("""SELECT epoch_ns(ts) // 1000000000 AS ts_sec,
             'app-' || event_type AS app,
             CASE CAST(event_id % 3 AS INT)
                  WHEN 0 THEN 'info' WHEN 1 THEN 'warn'
                  ELSE 'error' END AS level,
             event_id, props
             FROM events""")
    ),

    // out_kinesis_firehose (firehose_api.c:80-130): PutRecordBatch
    // bodies with base64-encoded record payloads, decoded back through
    // unbase64 — encode→decode gated.
    GraftQuery(
      "sink_kinesis_firehose",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val rec = Formats.jsonLine(Seq(
          "event_id" -> col("event_id"), "props" -> col("props")))
        val bodies = ev.groupBy(col("event_type"), expr("event_id div 500"))
          .agg(collect_list(rec).as("rs"))
          .select(Formats.kinesisFirehoseBody(
            concat(lit("stream-"), col("event_type")), col("rs")).as("body"))
        bodies
          .select(from_json(col("body"),
            org.apache.spark.sql.types.DataType.fromDDL(
              """struct<DeliveryStreamName: string,
                  Records: array<struct<Data string>>>""")).as("r"))
          .select(col("r.DeliveryStreamName").as("delivery_stream"),
            explode(col("r.Records")).as("rec"))
          .select(col("delivery_stream"),
            from_json(unbase64(col("rec.Data")).cast("string"),
              org.apache.spark.sql.types.StructType.fromDDL(PayloadDdl))
              .as("m"))
          .select(col("delivery_stream"),
            col("m.event_id").as("event_id"), col("m.props").as("props"))
      },
      Some("""SELECT 'stream-' || event_type AS delivery_stream,
             event_id, props FROM events""")
    ),

    // out_kinesis_streams (kinesis_api.c:140-190): PutRecords bodies —
    // base64 Data plus a per-record PartitionKey (deterministic here
    // where the reference appends a random suffix; the shape is what's
    // gated).
    GraftQuery(
      "sink_kinesis_streams",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val rec = struct(
          Formats.jsonLine(Seq(
            "event_id" -> col("event_id"), "props" -> col("props")))
            .as("data"),
          substring(md5(col("event_id").cast("string")), 1, 10)
            .as("partition_key"))
        val bodies = ev.groupBy(col("event_type"), expr("event_id div 500"))
          .agg(collect_list(rec).as("rs"))
          .select(Formats.kinesisStreamsBody(
            concat(lit("ks-"), col("event_type")), col("rs")).as("body"))
        bodies
          .select(from_json(col("body"),
            org.apache.spark.sql.types.DataType.fromDDL(
              """struct<StreamName: string, Records: array<struct<
                  Data string, PartitionKey string>>>""")).as("r"))
          .select(col("r.StreamName").as("stream"),
            explode(col("r.Records")).as("rec"))
          .select(col("stream"), col("rec.PartitionKey").as("partition_key"),
            from_json(unbase64(col("rec.Data")).cast("string"),
              org.apache.spark.sql.types.StructType.fromDDL(PayloadDdl))
              .as("m"))
          .select(col("stream"), col("partition_key"),
            col("m.event_id").as("event_id"), col("m.props").as("props"))
      },
      Some("""SELECT 'ks-' || event_type AS stream,
             substr(md5(CAST(event_id AS VARCHAR)), 1, 10) AS partition_key,
             event_id, props FROM events""")
    ),

    // out_slack (slack.c:220-230): one {"text": ...} webhook payload
    // per batch, records newline-joined — decode splits the text back
    // into per-record lines.
    GraftQuery(
      "sink_slack",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val line = Formats.jsonLine(Seq(
          "event_id" -> col("event_id"), "props" -> col("props")))
        val bodies = ev.groupBy(col("event_type"))
          .agg(array_join(collect_list(line), "\n").as("txt"))
          .select(col("event_type"), Formats.slackBody(col("txt")).as("body"))
        bodies
          .select(col("event_type"),
            explode(split(get_json_object(col("body"), "$.text"), "\n"))
              .as("l"))
          .select(col("event_type"),
            from_json(col("l"),
              org.apache.spark.sql.types.StructType.fromDDL(PayloadDdl))
              .as("m"))
          .select(col("event_type"), col("m.event_id").as("event_id"),
            col("m.props").as("props"))
      },
      Some("SELECT event_type, event_id, props FROM events")
    ),

    // out_nrlogs (newrelic.c:53-140,190-240): [{common, logs:[{timestamp
    // ms, message, attributes}]}] — the message key lifted, residual
    // fields under attributes.
    GraftQuery(
      "sink_nrlogs",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val bodies = ev.groupBy(col("event_type"))
          .agg(collect_list(Formats.nrlogsLine(
            expr("ts_ns div 1000000"),
            concat(lit("ev #"), col("event_id").cast("string")),
            map(lit("user_id"), col("user_id").cast("string"),
              lit("props"), col("props")))).as("ls"))
          .select(Formats.nrlogsBody(col("ls")).as("body"))
        bodies
          .select(explode(from_json(col("body"),
            org.apache.spark.sql.types.DataType.fromDDL(
              """array<struct<common struct<attributes struct<
                  plugin struct<type string>>>,
                  logs array<struct<timestamp bigint, message string,
                  attributes map<string,string>>>>>"""))).as("b"))
          .select(col("b.common.attributes.plugin.type").as("plugin_type"),
            explode(col("b.logs")).as("l"))
          .select(col("plugin_type"), col("l.timestamp").as("ts_ms"),
            col("l.message").as("message"),
            element_at(col("l.attributes"), "user_id").cast("long")
              .as("user_id"),
            element_at(col("l.attributes"), "props").as("props"))
      },
      Some("""SELECT 'graft' AS plugin_type,
             epoch_ns(ts) // 1000000 AS ts_ms,
             'ev #' || CAST(event_id AS VARCHAR) AS message,
             user_id, props
             FROM events""")
    ),

    // out_azure (azure.c:120-200): Log Analytics POST body — a bare
    // JSON array of records carrying the configured time key; the
    // SharedKey signature is header-side (HttpSink.azureSharedKeyAuth,
    // unit-spec'd).
    GraftQuery(
      "sink_azure",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val rec = struct(expr("ts_ns div 1000000").as("TimeGenerated"),
          col("event_id"), col("user_id"), col("props"))
        val bodies = ev.groupBy(col("event_type"), expr("event_id div 500"))
          .agg(collect_list(rec).as("rs"))
          .select(Formats.azureBody(col("rs")).as("body"))
        bodies
          .select(explode(from_json(col("body"),
            org.apache.spark.sql.types.DataType.fromDDL(
              """array<struct<TimeGenerated bigint, event_id bigint,
                  user_id bigint, props string>>"""))).as("r"))
          .select(col("r.TimeGenerated").as("time_generated"),
            col("r.event_id").as("event_id"),
            col("r.user_id").as("user_id"), col("r.props").as("props"))
      },
      Some("""SELECT epoch_ns(ts) // 1000000 AS time_generated,
             event_id, user_id, props FROM events""")
    ),

    // out_bigquery (bigquery.c:917-975): insertAll bodies {"rows":
    // [{"json":{…}}]} — no insertId, matching the reference.
    GraftQuery(
      "sink_bigquery",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val bodies = ev.groupBy(col("event_type"), expr("event_id div 500"))
          .agg(collect_list(struct(col("event_id"), col("user_id"),
            col("props"))).as("rs"))
          .select(Formats.bigqueryBody(col("rs")).as("body"))
        bodies
          .select(explode(from_json(col("body"),
            org.apache.spark.sql.types.DataType.fromDDL(
              s"""struct<rows: array<struct<json struct<event_id bigint,
                  user_id bigint, props string>>>>""")).getField("rows"))
            .as("r"))
          .select(col("r.json.event_id").as("event_id"),
            col("r.json.user_id").as("user_id"),
            col("r.json.props").as("props"))
      },
      Some("SELECT event_id, user_id, props FROM events")
    )
  )
}
