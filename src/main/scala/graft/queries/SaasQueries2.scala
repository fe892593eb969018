package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import graft.model.Tables
import graft.sinks.Formats

/** The remainder of the reference's output-plugin surface (SURVEY.md
  * §2.10): Kafka REST Proxy, PostgreSQL, SkyWalking, Chronicle, Azure
  * Kusto / Logs Ingestion / Blob block lists, OCI Log Analytics, plot,
  * Vivo, Treasure Data msgpack.gz and the OpenSearch/ES logstash-format
  * bulk variant. Each is gated as a build→parse round trip whose oracle
  * recomputes the flat truth straight from `events`; transport rides
  * the proven [[graft.sinks.HttpSink]]/[[graft.sinks.ObjectStoreSink]].
  */
object SaasQueries2 {

  private val PayloadDdl = "event_id bigint, user_id bigint, props string"

  private def payloadStruct = struct(col("event_id"), col("user_id"),
    col("props"))

  private def payloadJson = Formats.jsonLine(Seq(
    "event_id" -> col("event_id"), "user_id" -> col("user_id"),
    "props" -> col("props")))

  private def payloadCols(prefix: org.apache.spark.sql.Column) = Seq(
    prefix.getField("event_id").as("event_id"),
    prefix.getField("user_id").as("user_id"),
    prefix.getField("props").as("props"))

  val all: Seq[GraftQuery] = Seq(

    // out_kafka_rest (kafka.c:131-210): {"records":[{"key":…,"value":
    // {"@timestamp":"<%Y-%m-%dT%H:%M:%S.%09dZ>","tag":…,…record}}]} —
    // default time/tag keys (kafka.h:23-26), 9-digit nanos suffix
    // (kafka.c:190-195). The timestamp round-trips as seconds + nanos
    // reassembled into epoch nanos.
    GraftQuery(
      "sink_kafka_rest",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        // micro-truncated nanos: DuckDB reads the TIMESTAMP(NANOS)
        // column at micro resolution, so the oracle's epoch_ns carries
        // a 000 tail — same divergence note as sink_loki
        val rec = struct(
          substring(md5(col("event_id").cast("string")), 1, 8).as("key"),
          struct(
            Formats.isoFracZ(col("ts"),
              expr("(ts_ns - ts_ns % 1000) % 1000000000"), 9)
              .as("@timestamp"),
            concat(lit("app."), col("event_type")).as("tag"),
            col("event_id"), col("user_id"), col("props")).as("value"))
        val bodies = ev.groupBy(col("event_type"), expr("event_id div 500"))
          .agg(collect_list(rec).as("rs"))
          .select(Formats.kafkaRestBody(col("rs")).as("body"))
        bodies
          .select(explode(from_json(col("body"), DataType.fromDDL(
            """struct<records: array<struct<key string, value
               struct<`@timestamp` string, tag string, event_id bigint,
               user_id bigint, props string>>>>""")).getField("records"))
            .as("r"))
          .select(col("r.key").as("rec_key"), col("r.value.tag").as("tag"),
            // "<19 ISO chars>.<9 nano digits>Z" → epoch nanos
            (unix_timestamp(to_utc_timestamp(
              to_timestamp(substring(col("r.value.@timestamp"), 1, 19),
                "yyyy-MM-dd'T'HH:mm:ss"), lit("UTC"))) * lit(1000000000L) +
              substring(col("r.value.@timestamp"), 21, 9).cast("long"))
              .as("ts_ns"),
            col("r.value.event_id").as("event_id"),
            col("r.value.user_id").as("user_id"),
            col("r.value.props").as("props"))
      },
      Some("""SELECT substr(md5(CAST(event_id AS VARCHAR)), 1, 8) AS rec_key,
             'app.' || event_type AS tag, epoch_ns(ts) AS ts_ns,
             event_id, user_id, props FROM events""")
    ),

    // out_pgsql (pgsql.h:39-41 FLB_PGSQL_INSERT, pgsql.c:270-336): the
    // whole batch is ONE statement — INSERT INTO <table> SELECT '<tag>',
    // to_timestamp(…), * FROM json_array_elements('<JSON array>');
    // the decode re-extracts tag and array from the rendered SQL
    // (including the doubled-quote literal escaping) and explodes.
    GraftQuery(
      "sink_pgsql",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val rec = struct(
          // micro-truncate: the oracle's epoch_ns is micro-resolution
          (expr("ts_ns - ts_ns % 1000").cast("double") / lit(1.0e9))
            .as("date"),
          col("event_id"), col("user_id"), col("props"))
        val stmts = ev.groupBy(col("event_type"))
          .agg(to_json(collect_list(rec)).as("arr"))
          .select(Formats.pgsqlInsert("fluentbit", "date",
            concat(lit("app."), col("event_type")), col("arr")).as("stmt"))
        val unq = (c: org.apache.spark.sql.Column) =>
          regexp_replace(c, "''", "'")
        // the statement is megabytes — slice the array literal out with
        // locate/substr (a backtracking '((?:[^']|'')*)' regex over it
        // overflows the regex engine's stack)
        val marker = "json_array_elements('"
        val start = locate(marker, col("stmt")) + lit(marker.length)
        val arrEsc = col("stmt").substr(start,
          length(col("stmt")) - start - lit(2) + lit(1))
        stmts
          .select(
            unq(regexp_extract(substring(col("stmt"), 1, 512),
              "^INSERT INTO fluentbit SELECT '((?:[^']|'')*)', ", 1))
              .as("tag"),
            unq(arrEsc).as("arr"))
          .select(col("tag"), explode(from_json(col("arr"), DataType.fromDDL(
            """array<struct<date double, event_id bigint, user_id bigint,
               props string>>"""))).as("r"))
          .select(col("tag"), col("r.date").as("ts_float"),
            col("r.event_id").as("event_id"),
            col("r.user_id").as("user_id"), col("r.props").as("props"))
      },
      Some("""SELECT 'app.' || event_type AS tag,
             CAST(epoch_ns(ts) AS DOUBLE) / 1000000000.0 AS ts_float,
             event_id, user_id, props FROM events""")
    ),

    // out_skywalking (skywalking.c:121-276): JSON array of
    // {"timestamp":<ms half-up rounded>,"service","serviceInstance",
    // "body":{"json":{"json":"<record JSON string>"}}}.
    GraftQuery(
      "sink_skywalking",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        // timestamp_format (skywalking.c:121-133): ms, round half-up;
        // computed over micro-truncated nanos so the .5 ms boundary
        // matches the oracle's micro-resolution epoch_ns exactly
        val tsMs = expr("(ts_ns - ts_ns % 1000 + 500000) div 1000000")
        val bodies = ev.groupBy(col("event_type"), expr("event_id div 500"))
          .agg(collect_list(Formats.skywalkingLog(tsMs, lit("sw-service"),
            concat(lit("graft-"), col("event_type")), payloadJson)).as("ls"))
          .select(to_json(col("ls")).as("body"))
        bodies
          .select(explode(from_json(col("body"), DataType.fromDDL(
            """array<struct<timestamp bigint, service string,
               serviceInstance string,
               body struct<json struct<json string>>>>"""))).as("l"))
          .select(col("l.timestamp").as("ts_ms"),
            col("l.service").as("service"),
            col("l.serviceInstance").as("service_instance"),
            from_json(col("l.body.json.json"),
              StructType.fromDDL(PayloadDdl)).as("m"))
          .select(Seq(col("ts_ms"), col("service"), col("service_instance")) ++
            payloadCols(col("m")): _*)
      },
      Some("""SELECT (epoch_ns(ts) + 500000) // 1000000 AS ts_ms,
             'sw-service' AS service,
             'graft-' || event_type AS service_instance,
             event_id, user_id, props FROM events""")
    ),

    // out_chronicle (chronicle.c:1070-1190): unstructured-log body
    // {"customer_id","log_type","entries":[{"log_text":"<record JSON>",
    // "ts_rfc3339":"<%Y-%m-%dT%H:%M:%S.%09dZ>"}]}.
    GraftQuery(
      "sink_chronicle",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        // micro-truncated nanos — see sink_kafka_rest's oracle note
        val entry = Formats.chronicleEntry(payloadJson, col("ts"),
          expr("(ts_ns - ts_ns % 1000) % 1000000000"))
        val bodies = ev.groupBy(col("event_type"), expr("event_id div 500"))
          .agg(collect_list(entry).as("es"))
          .select(Formats.chronicleBody(lit("graft-customer"),
            concat(lit("GRAFT_"), upper(col("event_type"))), col("es"))
            .as("body"))
        bodies
          .select(from_json(col("body"), DataType.fromDDL(
            """struct<customer_id string, log_type string, entries
               array<struct<log_text string, ts_rfc3339 string>>>"""))
            .as("b"))
          .select(col("b.customer_id").as("customer_id"),
            col("b.log_type").as("log_type"),
            explode(col("b.entries")).as("e"))
          .select(col("customer_id"), col("log_type"),
            (unix_timestamp(to_utc_timestamp(
              to_timestamp(substring(col("e.ts_rfc3339"), 1, 19),
                "yyyy-MM-dd'T'HH:mm:ss"), lit("UTC"))) * lit(1000000000L) +
              substring(col("e.ts_rfc3339"), 21, 9).cast("long")).as("ts_ns"),
            from_json(col("e.log_text"), StructType.fromDDL(PayloadDdl))
              .as("m"))
          .select(Seq(col("customer_id"), col("log_type"), col("ts_ns")) ++
            payloadCols(col("m")): _*)
      },
      Some("""SELECT 'graft-customer' AS customer_id,
             'GRAFT_' || upper(event_type) AS log_type,
             epoch_ns(ts) AS ts_ns, event_id, user_id, props FROM events""")
    ),

    // out_azure_kusto (azure_kusto.c:1085-1130): newline-joined JSON
    // lines {"timestamp":"<ISO8601.%03dZ>","tag":…,"log":{record}} with
    // the default key names (azure_kusto.h:56-58).
    GraftQuery(
      "sink_kusto",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val line = Formats.kustoLine(col("ts"),
          expr("(ts_ns div 1000000) % 1000"),
          concat(lit("app."), col("event_type")), payloadStruct)
        val bodies = ev.groupBy(col("event_type"), expr("event_id div 500"))
          .agg(concat_ws("\n", collect_list(line)).as("body"))
        bodies
          .select(explode(split(col("body"), "\n")).as("line"))
          .select(from_json(col("line"), DataType.fromDDL(
            s"""struct<timestamp string, tag string,
                log struct<$PayloadDdl>>""")).as("r"))
          .select(
            (unix_timestamp(to_utc_timestamp(
              to_timestamp(substring(col("r.timestamp"), 1, 19),
                "yyyy-MM-dd'T'HH:mm:ss"), lit("UTC"))) * lit(1000L) +
              substring(col("r.timestamp"), 21, 3).cast("long")).as("ts_ms"),
            col("r.tag").as("tag"),
            col("r.log.event_id").as("event_id"),
            col("r.log.user_id").as("user_id"),
            col("r.log.props").as("props"))
      },
      Some("""SELECT epoch_ns(ts) // 1000000 AS ts_ms,
             'app.' || event_type AS tag, event_id, user_id, props
             FROM events""")
    ),

    // out_azure_logs_ingestion (azure_logs_ingestion.c:80-150): a bare
    // JSON array of records led by the "@timestamp" time key
    // (ISO8601 + .%03dZ millis).
    GraftQuery(
      "sink_azure_li",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val rec = struct(
          Formats.isoFracZ(col("ts"), expr("(ts_ns div 1000000) % 1000"), 3)
            .as("@timestamp"),
          col("event_id"), col("user_id"), col("props"))
        val bodies = ev.groupBy(col("event_type"), expr("event_id div 500"))
          .agg(collect_list(rec).as("rs"))
          .select(Formats.azureLogsIngestionBody(col("rs")).as("body"))
        bodies
          .select(explode(from_json(col("body"), DataType.fromDDL(
            """array<struct<`@timestamp` string, event_id bigint,
               user_id bigint, props string>>"""))).as("r"))
          .select(
            (unix_timestamp(to_utc_timestamp(
              to_timestamp(substring(col("r.@timestamp"), 1, 19),
                "yyyy-MM-dd'T'HH:mm:ss"), lit("UTC"))) * lit(1000L) +
              substring(col("r.@timestamp"), 21, 3).cast("long")).as("ts_ms"),
            col("r.event_id").as("event_id"),
            col("r.user_id").as("user_id"), col("r.props").as("props"))
      },
      Some("""SELECT epoch_ns(ts) // 1000000 AS ts_ms,
             event_id, user_id, props FROM events""")
    ),

    // out_oracle_log_analytics (oci_logan.c:735-870): {"metadata":{…},
    // "logEvents":[{"logSourceName","logPath","metadata",
    // "logRecords":["<record JSON>",…]}]}.
    GraftQuery(
      "sink_oci_logan",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val bodies = ev.groupBy(col("event_type"))
          .agg(collect_list(payloadJson).as("recs"))
          .select(Formats.ociLoganBody(
            map(lit("Environment"), lit("prod")),
            array(Formats.ociLogEvent(lit("GraftSource"),
              concat(lit("/var/log/"), col("event_type"), lit(".log")),
              map(lit("type"), col("event_type")), col("recs"))))
            .as("body"))
        bodies
          .select(from_json(col("body"), DataType.fromDDL(
            """struct<metadata map<string,string>, logEvents
               array<struct<logSourceName string, logPath string,
               metadata map<string,string>, logRecords array<string>>>>"""))
            .as("b"))
          .select(element_at(col("b.metadata"), "Environment").as("env"),
            explode(col("b.logEvents")).as("e"))
          .select(col("env"), col("e.logSourceName").as("source_name"),
            col("e.logPath").as("log_path"),
            explode(col("e.logRecords")).as("rec"))
          .select(Seq(col("env"), col("source_name"), col("log_path")) ++
            payloadCols(from_json(col("rec"),
              StructType.fromDDL(PayloadDdl))): _*)
      },
      Some("""SELECT 'prod' AS env, 'GraftSource' AS source_name,
             '/var/log/' || event_type || '.log' AS log_path,
             event_id, user_id, props FROM events""")
    ),

    // out_plot (plot.c:170-198): "%f %<value>" lines — six-decimal
    // time double, space, the configured key's integer value.
    GraftQuery(
      "sink_plot",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val lines = ev.select(Formats.plotLine(
          col("ts_sec").cast("double"), col("event_id")).as("line"))
        lines
          .select(split(col("line"), " ").as("p"))
          .select(element_at(col("p"), 1).cast("double").as("ts_dbl"),
            element_at(col("p"), 2).cast("long").as("plot_value"))
      },
      Some("""SELECT CAST(epoch_ns(ts) // 1000000000 AS DOUBLE) AS ts_dbl,
             event_id AS plot_value FROM events""")
    ),

    // out_vivo_exporter (vivo.c:93-160): {"source_type","source_name",
    // "tag","records":[{"timestamp":<ns>,"metadata":{…},…body}]}.
    GraftQuery(
      "sink_vivo",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        // micro-truncated nanos — see sink_kafka_rest's oracle note
        val rec = struct(expr("ts_ns - ts_ns % 1000").as("timestamp"),
          map(lit("level"),
            element_at(array(lit("info"), lit("warn"), lit("error")),
              (col("event_id") % 3 + 1).cast("int"))).as("metadata"),
          col("event_id"), col("user_id"), col("props"))
        val bodies = ev.groupBy(col("event_type"), expr("event_id div 500"))
          .agg(collect_list(rec).as("rs"))
          .select(Formats.vivoBody(lit("forward"), lit("forward.0"),
            concat(lit("app."), col("event_type")), col("rs")).as("body"))
        bodies
          .select(from_json(col("body"), DataType.fromDDL(
            """struct<source_type string, source_name string, tag string,
               records array<struct<timestamp bigint,
               metadata map<string,string>, event_id bigint,
               user_id bigint, props string>>>""")).as("b"))
          .select(col("b.source_type").as("source_type"),
            col("b.tag").as("tag"), explode(col("b.records")).as("r"))
          .select(col("source_type"), col("tag"),
            col("r.timestamp").as("ts_ns"),
            element_at(col("r.metadata"), "level").as("level"),
            col("r.event_id").as("event_id"),
            col("r.user_id").as("user_id"), col("r.props").as("props"))
      },
      Some("""SELECT 'forward' AS source_type, 'app.' || event_type AS tag,
             epoch_ns(ts) AS ts_ns,
             CASE CAST(event_id % 3 AS INT) WHEN 0 THEN 'info'
                  WHEN 1 THEN 'warn' ELSE 'error' END AS level,
             event_id, user_id, props FROM events""")
    ),

    // out_azure_blob block-blob commit (azure_blob_blockblob.c:229-300
    // block ids, :460-500 Put Block List XML): ids are base64 of
    // "<md5hex(path)>.flb-part.%06d" — the XML payload and the id
    // derivation both round-trip, gated against DuckDB's own
    // md5/base64/printf.
    GraftQuery(
      "sink_azure_blob",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val path = concat(lit("logs/app."), col("event_type"), lit(".log"))
        val parts = ev
          .select(path.as("path"), expr("event_id div 500").as("part_id"))
          .distinct()
        val payloads = parts.groupBy(col("path"))
          .agg(array_sort(collect_list(struct(col("part_id"),
            Formats.azureBlockId(col("path"), col("part_id")).as("bid"))))
            .as("blocks"))
          .select(col("path"), Formats.azureBlockListPayload(col("path"),
            transform(col("blocks"), b => b.getField("bid"))).as("xml"))
        payloads
          .select(
            regexp_extract(col("xml"), "<!-- (.*) -->", 1).as("blob_path"),
            explode(expr(
              "regexp_extract_all(xml, '<Uncommitted>([^<]*)</Uncommitted>', 1)"))
              .as("bid"))
          .select(col("blob_path"),
            unbase64(col("bid")).cast("string").as("decoded"))
          .select(col("blob_path"),
            regexp_extract(col("decoded"), "^([0-9a-f]{32})\\.flb-part\\.", 1)
              .as("path_md5"),
            regexp_extract(col("decoded"), "\\.flb-part\\.([0-9]{6})$", 1)
              .cast("long").as("part_id"))
      },
      Some("""SELECT DISTINCT
             'logs/app.' || event_type || '.log' AS blob_path,
             md5('logs/app.' || event_type || '.log') AS path_md5,
             event_id // 500 AS part_id FROM events""")
    ),

    // out_td (td.c:44-102, td_http.c:40-90): records re-packed as
    // msgpack maps {"time": int seconds, …record}, concatenated and
    // gzipped. Encode→gunzip→decode gated through graft.sinks.TdSink
    // (wire codecs are JVM functions — a typed mapPartitions batches
    // rows into real bodies, like the remote-write sink).
    GraftQuery(
      "sink_td",
      (s, dir) => {
        import s.implicits._
        import graft.sources.Msgpack._
        val ev = Tables.events(s, dir)
        val bodies = ev
          .select(col("ts_sec"), col("event_id"), col("user_id"),
            col("props"))
          .as[(Long, Long, Long, String)]
          .mapPartitions { it =>
            it.grouped(512).map { grp =>
              graft.sinks.TdSink.encodeBody(grp.map { case (t, e, u, p) =>
                (t, Seq[(String, V)]("event_id" -> MInt(e),
                  "user_id" -> MInt(u), "props" -> MStr(p)))
              })
            }
          }.toDF("body")
        bodies.as[Array[Byte]]
          .flatMap { body =>
            graft.sinks.TdSink.decodeBody(body).map { case (t, m) =>
              val i = (k: String) => m(k) match {
                case MInt(v) => v
                case other => throw new IllegalArgumentException(s"$other")
              }
              val str = (k: String) => m(k) match {
                case ms: MStr => ms.s
                case other => throw new IllegalArgumentException(s"$other")
              }
              (t, i("event_id"), i("user_id"), str("props"))
            }
          }.toDF("ts_sec", "event_id", "user_id", "props")
      },
      Some("""SELECT epoch_ns(ts) // 1000000000 AS ts_sec,
             event_id, user_id, props FROM events""")
    ),

    // out_opensearch / out_es logstash_format (opensearch.c:246-280
    // es_bulk_index + opensearch.h:28-29 defaults): the index name is
    // "logstash" + "-" + strftime("%Y.%m.%d", gmtime(record time)),
    // actions carry the record _id; bodies re-ingest through the same
    // single-pass bulk scanner as f_es_bulk_ingest.
    GraftQuery(
      "sink_os_bulk",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val utcTs = to_utc_timestamp(col("ts"), expr("current_timezone()"))
        val index = concat(lit("logstash-"),
          date_format(utcTs, "yyyy.MM.dd"))
        val action = concat(lit("{\"create\":{\"_index\":\""), index,
          lit("\",\"_id\":\""), col("event_id").cast("string"),
          lit("\"}}"))
        val bodies = ev
          .groupBy(col("event_type"), expr("event_id div 256"))
          .agg(concat_ws("\n",
            collect_list(concat(action, lit("\n"), payloadJson))).as("body"))
          .select(col("body"))
        graft.parse.Parsers.esBulk(bodies, col("body"))
          .select(col("write_op"),
            get_json_object(col("meta"), "$.create._index").as("index_name"),
            get_json_object(col("meta"), "$.create._id").cast("long")
              .as("doc_id"),
            from_json(col("doc"), StructType.fromDDL(PayloadDdl)).as("m"))
          .select(Seq(col("write_op"), col("index_name"), col("doc_id")) ++
            payloadCols(col("m")): _*)
      },
      Some("""SELECT 'create' AS write_op,
             'logstash-' || strftime(ts, '%Y.%m.%d') AS index_name,
             event_id AS doc_id, event_id, user_id, props FROM events""")
    )
  )
}
