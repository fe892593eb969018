package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** OTLP/HTTP logs ingestion — the decode path of the reference's
  * `plugins/in_opentelemetry` (`opentelemetry_logs.c`,
  * `opentelemetry_prot.c`): an `ExportLogsServiceRequest` JSON body
  * (`resourceLogs[] → scopeLogs[] → logRecords[]`) flattens into one log
  * event per record, carrying the resource/scope group attributes and
  * the per-record OTLP metadata the reference packs under its
  * `logs_metadata_key` (opentelemetry_logs.c:297-385): observed
  * timestamp, severity number/text, attributes, trace/span ids, flags,
  * event name.
  *
  * Event-time rule (opentelemetry_logs.c:654-669): `timeUnixNano` when
  * > 0, else `observedTimeUnixNano`. Severity number is only kept in the
  * valid OTLP range 1..24 (opentelemetry_logs.c:313).
  *
  * Scale shape: `from_json` + three `explode`s — a narrow, map-only
  * plan; one POST body (however many records it carries) never needs to
  * be wider than one task, and records redistribute downstream.
  */
object Otlp {

  /** proto3-JSON `AnyValue` (string/int/double/bool — the scalar subset;
    * int64 arrives as a JSON string per proto3 JSON mapping).
    */
  private val AnyValueDdl =
    "struct<stringValue string, intValue string, doubleValue double, boolValue boolean>"

  private val KvListDdl = s"array<struct<key string, value $AnyValueDdl>>"

  /** ExportLogsServiceRequest (logs.proto): the JSON shape of an
    * OTLP/HTTP POST to /v1/logs. traceId/spanId are hex strings (the
    * OTLP JSON mapping special-cases bytes→hex for ids).
    */
  val LogsSchema: StructType = DataType.fromDDL(
    s"""resourceLogs array<struct<
          resource struct<attributes $KvListDdl>,
          scopeLogs array<struct<
            scope struct<name string, version string>,
            logRecords array<struct<
              timeUnixNano string,
              observedTimeUnixNano string,
              severityNumber int,
              severityText string,
              body $AnyValueDdl,
              attributes $KvListDdl,
              droppedAttributesCount int,
              flags int,
              traceId string,
              spanId string,
              eventName string>>>>>>""").asInstanceOf[StructType]

  /** AnyValue → its string rendering (first present branch wins). */
  private def anyToString(v: Column): Column =
    coalesce(v.getField("stringValue"), v.getField("intValue"),
      v.getField("doubleValue").cast("string"),
      v.getField("boolValue").cast("string"))

  /** KeyValue list → map<string,string>; null list stays null (the
    * reference omits absent attribute maps rather than emitting {}).
    */
  private def kvToMap(c: Column): Column =
    map_from_entries(transform(c, a =>
      struct(a.getField("key"), anyToString(a.getField("value")))))

  /** Decode a column of OTLP/HTTP logs JSON bodies into one row per
    * logRecord. Pass-through columns of `df` (tag, path, arrival ts…)
    * are preserved; `jsonCol` itself is dropped.
    *
    * Output columns: resource_attributes map, scope_name, scope_version,
    * ts_unix_nano (effective event time), time_unix_nano,
    * observed_time_unix_nano, severity_number, severity_text, body,
    * attributes map, trace_id, span_id, trace_flags, event_name.
    */
  def decodeLogs(df: DataFrame, jsonCol: Column): DataFrame = {
    val keep = df.columns.map(col)
    val t = col("__lr.timeUnixNano").cast("long")
    val o = col("__lr.observedTimeUnixNano").cast("long")
    val sev = col("__lr.severityNumber")
    df.withColumn("__req", from_json(jsonCol, LogsSchema))
      .select(keep :+ explode(col("__req.resourceLogs")).as("__rl"): _*)
      .select(keep ++ Seq(col("__rl.resource.attributes").as("__rattrs"),
        explode(col("__rl.scopeLogs")).as("__sl")): _*)
      .select(keep ++ Seq(col("__rattrs"), col("__sl.scope").as("__scope"),
        explode(col("__sl.logRecords")).as("__lr")): _*)
      .select(keep ++ Seq(
        kvToMap(col("__rattrs")).as("resource_attributes"),
        col("__scope.name").as("scope_name"),
        col("__scope.version").as("scope_version"),
        // "Value of 0 indicates unknown or missing timestamp" — fall
        // back to the observed time like the reference event encoder
        when(coalesce(t, lit(0L)) > 0, t).otherwise(o).as("ts_unix_nano"),
        t.as("time_unix_nano"),
        o.as("observed_time_unix_nano"),
        when(sev.between(1, 24), sev).as("severity_number"),
        col("__lr.severityText").as("severity_text"),
        anyToString(col("__lr.body")).as("body"),
        kvToMap(col("__lr.attributes")).as("attributes"),
        col("__lr.traceId").as("trace_id"),
        col("__lr.spanId").as("span_id"),
        coalesce(col("__lr.flags"), lit(0)).bitwiseAND(255).as("trace_flags"),
        col("__lr.eventName").as("event_name")): _*)
  }

  // ---------------------------------------------------------------------
  // Logs encode (out_opentelemetry) — plugins/out_opentelemetry/
  // opentelemetry_logs.c
  // ---------------------------------------------------------------------

  /** map<string,string> → proto3-JSON KeyValue list, sorted by key so a
    * resource's identity is stable (the reference groups records under a
    * resource by an order-insensitive identity hash of its attributes,
    * opentelemetry_logs.c:267-281; sorting gives the same equivalence
    * with plain byte-equality).
    */
  private def mapToKv(m: Column): Column =
    transform(array_sort(map_entries(m)), e => struct(
      e.getField("key").as("key"),
      struct(e.getField("value").as("stringValue")).as("value")))

  /** Encode a flat log frame into OTLP/HTTP `ExportLogsServiceRequest`
    * JSON bodies — the delivery shape of the reference's
    * `out_opentelemetry` logs path: records sharing a resource identity
    * (attribute set) and scope are grouped under one
    * `resourceLogs[].scopeLogs[]` entry (opentelemetry_logs.c:267-300),
    * one JSON body per resource.
    *
    * Inverse of [[decodeLogs]]; `sink_otlp_logs` gates the round trip.
    * Null columns are dropped from the JSON by the writer, matching
    * proto3-JSON absence semantics.
    *
    * Scale shape: one shuffle on the resource identity (the same
    * grouping any per-destination batching needs); record payloads
    * travel once. Body counts stay bounded because a resource's records
    * land in one aggregation buffer only per micro-batch/partition
    * group, mirroring the HTTP sink's batch-per-POST contract.
    */
  def encodeLogs(df: DataFrame,
                 resourceAttrs: Column,
                 scopeName: Column,
                 scopeVersion: Column,
                 tsUnixNano: Column,
                 severityNumber: Column,
                 severityText: Column,
                 body: Column,
                 attributes: Column,
                 traceId: Column): DataFrame = {
    val rec = struct(
      tsUnixNano.cast("string").as("timeUnixNano"),
      severityNumber.cast("int").as("severityNumber"),
      severityText.as("severityText"),
      struct(body.as("stringValue")).as("body"),
      mapToKv(attributes).as("attributes"),
      traceId.as("traceId"))
    df.groupBy(mapToKv(resourceAttrs).as("__rattrs"),
        scopeName.as("__sname"), scopeVersion.as("__sver"))
      .agg(collect_list(rec).as("__recs"))
      .select(to_json(struct(array(struct(
        struct(col("__rattrs").as("attributes")).as("resource"),
        array(struct(
          struct(col("__sname").as("name"), col("__sver").as("version"))
            .as("scope"),
          col("__recs").as("logRecords"))).as("scopeLogs")
      )).as("resourceLogs"))).as("body"))
  }

  // ---------------------------------------------------------------------
  // Metrics + traces encode (out_opentelemetry) — the reference exports
  // all three signals (plugins/out_opentelemetry/opentelemetry.c:38-53
  // pulls the cmetrics/ctraces encoders); these complete the triad next
  // to [[encodeLogs]].
  // ---------------------------------------------------------------------

  /** Encode the engine's long-format metrics frame (the schema
    * [[decodeMetrics]] emits) into `ExportMetricsServiceRequest` JSON
    * bodies — one body per resource identity, metrics grouped under it,
    * one dataPoint per input row. `metricType` selects which of the four
    * point kinds (gauge/sum/histogram/summary) the row lands in, matching
    * the reference's cmt_encode_opentelemetry type dispatch.
    *
    * Inverse of [[decodeMetrics]]; `sink_otlp_metrics` gates the round
    * trip. Scale shape: two keyed aggregations (resource×metric → dps,
    * resource → metrics) — the same grouping per-destination batching
    * needs; point payloads travel once.
    */
  def encodeMetrics(df: DataFrame,
                    resourceAttrs: Column,
                    scopeName: Column,
                    scopeVersion: Column,
                    name: Column,
                    metricType: Column,
                    temporality: Column,
                    isMonotonic: Column,
                    labels: Column,
                    tsUnixNano: Column,
                    value: Column,
                    count: Column,
                    sum: Column,
                    bucketCounts: Column,
                    explicitBounds: Column,
                    quantiles: Column): DataFrame = {
    // one wide point per row; each metric kind projects its subset below
    val dp = struct(
      mapToKv(labels).as("attributes"),
      tsUnixNano.cast("string").as("timeUnixNano"),
      value.cast("double").as("asDouble"),
      count.cast("string").as("count"),
      sum.cast("double").as("sum"),
      transform(bucketCounts, c => c.cast("string")).as("bucketCounts"),
      explicitBounds.cast("array<double>").as("explicitBounds"),
      quantiles.cast("array<struct<quantile double, value double>>")
        .as("quantileValues"))
    val perMetric = df
      .groupBy(mapToKv(resourceAttrs).as("__rattrs"),
        scopeName.as("__sname"), scopeVersion.as("__sver"),
        name.as("__mname"), metricType.as("__mtype"),
        temporality.cast("int").as("__temp"),
        isMonotonic.cast("boolean").as("__mono"))
      .agg(collect_list(dp).as("__dps"))
    val numDps = transform(col("__dps"), p => struct(
      p.getField("attributes").as("attributes"),
      p.getField("timeUnixNano").as("timeUnixNano"),
      p.getField("asDouble").as("asDouble")))
    val histDps = transform(col("__dps"), p => struct(
      p.getField("attributes").as("attributes"),
      p.getField("timeUnixNano").as("timeUnixNano"),
      p.getField("count").as("count"),
      p.getField("sum").as("sum"),
      p.getField("bucketCounts").as("bucketCounts"),
      p.getField("explicitBounds").as("explicitBounds")))
    val summDps = transform(col("__dps"), p => struct(
      p.getField("attributes").as("attributes"),
      p.getField("timeUnixNano").as("timeUnixNano"),
      p.getField("count").as("count"),
      p.getField("sum").as("sum"),
      p.getField("quantileValues").as("quantileValues")))
    // unchosen kinds stay NULL and to_json drops them (proto3-JSON
    // absence), so each metric carries exactly one point-kind branch
    val metric = struct(
      col("__mname").as("name"),
      when(col("__mtype") === "gauge", struct(numDps.as("dataPoints")))
        .as("gauge"),
      when(col("__mtype") === "sum", struct(numDps.as("dataPoints"),
        col("__temp").as("aggregationTemporality"),
        col("__mono").as("isMonotonic"))).as("sum"),
      when(col("__mtype") === "histogram", struct(histDps.as("dataPoints"),
        col("__temp").as("aggregationTemporality"))).as("histogram"),
      when(col("__mtype") === "summary", struct(summDps.as("dataPoints")))
        .as("summary"))
    perMetric
      .groupBy(col("__rattrs"), col("__sname"), col("__sver"))
      .agg(collect_list(metric).as("__metrics"))
      .select(to_json(struct(array(struct(
        struct(col("__rattrs").as("attributes")).as("resource"),
        array(struct(
          struct(col("__sname").as("name"), col("__sver").as("version"))
            .as("scope"),
          col("__metrics").as("metrics"))).as("scopeMetrics")
      )).as("resourceMetrics"))).as("body"))
  }

  /** Encode the engine's span frame (the schema [[decodeTraces]] emits)
    * into `ExportTraceServiceRequest` JSON bodies — spans grouped under
    * one resource identity per body, span events carried through as
    * nested structs (`events` must be
    * `array<struct<ts_unix_nano, name, attributes map>>` or NULL).
    *
    * Inverse of [[decodeTraces]]; `sink_otlp_traces` gates the round
    * trip. One shuffle on the resource identity.
    */
  def encodeTraces(df: DataFrame,
                   resourceAttrs: Column,
                   scopeName: Column,
                   scopeVersion: Column,
                   traceId: Column,
                   spanId: Column,
                   parentSpanId: Column,
                   traceState: Column,
                   name: Column,
                   kind: Column,
                   startUnixNano: Column,
                   endUnixNano: Column,
                   attributes: Column,
                   events: Column,
                   statusCode: Column,
                   statusMessage: Column): DataFrame = {
    val span = struct(
      traceId.as("traceId"),
      spanId.as("spanId"),
      traceState.as("traceState"),
      parentSpanId.as("parentSpanId"),
      name.as("name"),
      kind.cast("int").as("kind"),
      startUnixNano.cast("string").as("startTimeUnixNano"),
      endUnixNano.cast("string").as("endTimeUnixNano"),
      mapToKv(attributes).as("attributes"),
      transform(
        events.cast(
          "array<struct<ts_unix_nano long, name string, attributes map<string,string>>>"),
        e => struct(
          e.getField("ts_unix_nano").cast("string").as("timeUnixNano"),
          e.getField("name").as("name"),
          mapToKv(e.getField("attributes")).as("attributes"))).as("events"),
      struct(statusMessage.as("message"), statusCode.cast("int").as("code"))
        .as("status"))
    df.groupBy(mapToKv(resourceAttrs).as("__rattrs"),
        scopeName.as("__sname"), scopeVersion.as("__sver"))
      .agg(collect_list(span).as("__spans"))
      .select(to_json(struct(array(struct(
        struct(col("__rattrs").as("attributes")).as("resource"),
        array(struct(
          struct(col("__sname").as("name"), col("__sver").as("version"))
            .as("scope"),
          col("__spans").as("spans"))).as("scopeSpans")
      )).as("resourceSpans"))).as("body"))
  }

  // ---------------------------------------------------------------------
  // Metrics (/v1/metrics) — flb_opentelemetry_metrics.c
  // ---------------------------------------------------------------------

  /** proto3-JSON NumberDataPoint: int64 values arrive as JSON strings
    * ("asInt"), doubles as numbers ("asDouble")
    * (flb_opentelemetry_metrics.c:721-727).
    */
  private val NumberDpDdl =
    s"""struct<attributes $KvListDdl, startTimeUnixNano string,
          timeUnixNano string, asDouble double, asInt string>"""

  private val HistDpDdl =
    s"""struct<attributes $KvListDdl, startTimeUnixNano string,
          timeUnixNano string, count string, sum double,
          bucketCounts array<string>, explicitBounds array<double>,
          min double, max double>"""

  private val SummDpDdl =
    s"""struct<attributes $KvListDdl, startTimeUnixNano string,
          timeUnixNano string, count string, sum double,
          quantileValues array<struct<quantile double, value double>>>"""

  /** ExportMetricsServiceRequest (metrics.proto JSON mapping): the four
    * point kinds the reference decodes (gauge / sum / histogram /
    * summary, flb_opentelemetry_metrics.c:3161-3384; exponential
    * histogram is rejected there too — :3384 only errors on it).
    */
  val MetricsSchema: StructType = DataType.fromDDL(
    s"""resourceMetrics array<struct<
          resource struct<attributes $KvListDdl>,
          scopeMetrics array<struct<
            scope struct<name string, version string>,
            metrics array<struct<
              name string, description string, unit string,
              gauge struct<dataPoints array<$NumberDpDdl>>,
              sum struct<dataPoints array<$NumberDpDdl>,
                aggregationTemporality int, isMonotonic boolean>,
              histogram struct<dataPoints array<$HistDpDdl>,
                aggregationTemporality int>,
              summary struct<dataPoints array<$SummDpDdl>>>>>>>>"""
  ).asInstanceOf[StructType]

  /** Decode OTLP/HTTP metrics JSON bodies into the engine's long-format
    * metrics frame: one row per data point, `metric_type` in
    * {gauge, sum, histogram, summary} (the reference's type table at
    * flb_opentelemetry_metrics.c:328-334), scalar `value` for
    * gauge/sum (asDouble wins over asInt like the decode order at
    * :721-727), and count/sum/buckets/bounds/quantiles for the
    * distribution kinds.
    *
    * Scale shape: from_json + three explodes + one normalizing
    * transform per metric kind — map-only and codegen-friendly; no
    * shuffle until the caller aggregates.
    */
  def decodeMetrics(df: DataFrame, jsonCol: Column): DataFrame = {
    val keep = df.columns.map(col)
    // normalize each kind's dataPoints into one common struct so a
    // single explode covers all four metric shapes
    def num(kind: String, dps: Column) = transform(dps, p => struct(
      lit(kind).as("metric_type"),
      p.getField("attributes").as("attributes"),
      p.getField("startTimeUnixNano").cast("long").as("start_unix_nano"),
      p.getField("timeUnixNano").cast("long").as("ts_unix_nano"),
      coalesce(p.getField("asDouble"), p.getField("asInt").cast("double"))
        .as("value"),
      lit(null).cast("long").as("count"),
      lit(null).cast("double").as("sum"),
      lit(null).cast("array<long>").as("bucket_counts"),
      lit(null).cast("array<double>").as("explicit_bounds"),
      lit(null).cast("array<struct<quantile double, value double>>")
        .as("quantiles")))
    def dist(kind: String, dps: Column) = transform(dps, p => struct(
      lit(kind).as("metric_type"),
      p.getField("attributes").as("attributes"),
      p.getField("startTimeUnixNano").cast("long").as("start_unix_nano"),
      p.getField("timeUnixNano").cast("long").as("ts_unix_nano"),
      lit(null).cast("double").as("value"),
      p.getField("count").cast("long").as("count"),
      p.getField("sum").as("sum"),
      (if (kind == "histogram")
         transform(p.getField("bucketCounts"), c => c.cast("long"))
       else lit(null).cast("array<long>")).as("bucket_counts"),
      (if (kind == "histogram") p.getField("explicitBounds")
       else lit(null).cast("array<double>")).as("explicit_bounds"),
      (if (kind == "summary") p.getField("quantileValues")
       else lit(null).cast("array<struct<quantile double, value double>>"))
        .as("quantiles")))
    val m = col("__m")
    df.withColumn("__req", from_json(jsonCol, MetricsSchema))
      .select(keep :+ explode(col("__req.resourceMetrics")).as("__rm"): _*)
      .select(keep ++ Seq(col("__rm.resource.attributes").as("__rattrs"),
        explode(col("__rm.scopeMetrics")).as("__sm")): _*)
      .select(keep ++ Seq(col("__rattrs"), col("__sm.scope").as("__scope"),
        explode(col("__sm.metrics")).as("__m")): _*)
      .select(keep ++ Seq(col("__rattrs"), col("__scope"), col("__m"),
        explode(concat(
          coalesce(num("gauge", m.getField("gauge").getField("dataPoints")),
            array()),
          coalesce(num("sum", m.getField("sum").getField("dataPoints")),
            array()),
          coalesce(dist("histogram",
            m.getField("histogram").getField("dataPoints")), array()),
          coalesce(dist("summary",
            m.getField("summary").getField("dataPoints")), array())))
          .as("__dp")): _*)
      .select(keep ++ Seq(
        kvToMap(col("__rattrs")).as("resource_attributes"),
        col("__scope.name").as("scope_name"),
        col("__m.name").as("name"),
        col("__m.description").as("description"),
        col("__m.unit").as("unit"),
        col("__dp.metric_type").as("metric_type"),
        // temporality/monotonic only exist on sum/histogram
        // (flb_opentelemetry_metrics.c:3233-3306)
        when(col("__dp.metric_type") === "sum",
          col("__m.sum.aggregationTemporality"))
          .when(col("__dp.metric_type") === "histogram",
            col("__m.histogram.aggregationTemporality"))
          .as("temporality"),
        when(col("__dp.metric_type") === "sum", col("__m.sum.isMonotonic"))
          .as("is_monotonic"),
        kvToMap(col("__dp.attributes")).as("labels"),
        col("__dp.start_unix_nano").as("start_unix_nano"),
        col("__dp.ts_unix_nano").as("ts_unix_nano"),
        col("__dp.value").as("value"),
        col("__dp.count").as("count"),
        col("__dp.sum").as("sum"),
        col("__dp.bucket_counts").as("bucket_counts"),
        col("__dp.explicit_bounds").as("explicit_bounds"),
        col("__dp.quantiles").as("quantiles")): _*)
  }

  // ---------------------------------------------------------------------
  // Traces (/v1/traces) — flb_opentelemetry_traces.c
  // ---------------------------------------------------------------------

  /** ExportTraceServiceRequest (trace.proto JSON mapping): the span
    * fields the reference extracts at flb_opentelemetry_traces.c:
    * 762-897 (traceState, parentSpanId, start/end nanos, kind, events,
    * links, status). Ids are hex strings per the OTLP JSON mapping.
    */
  val TracesSchema: StructType = DataType.fromDDL(
    s"""resourceSpans array<struct<
          resource struct<attributes $KvListDdl>,
          scopeSpans array<struct<
            scope struct<name string, version string>,
            spans array<struct<
              traceId string, spanId string, traceState string,
              parentSpanId string, flags int, name string, kind int,
              startTimeUnixNano string, endTimeUnixNano string,
              attributes $KvListDdl,
              droppedAttributesCount int,
              events array<struct<timeUnixNano string, name string,
                attributes $KvListDdl>>,
              droppedEventsCount int,
              links array<struct<traceId string, spanId string,
                traceState string>>,
              status struct<message string, code int>>>>>>>"""
  ).asInstanceOf[StructType]

  /** Decode OTLP/HTTP traces JSON bodies into the engine's span frame
    * (SURVEY §1.1: trace_id, span_id, parent_id, name, start, end,
    * attrs, status) — one row per span, span events kept as a nested
    * array. Feeds the tail-sampling processor directly.
    */
  def decodeTraces(df: DataFrame, jsonCol: Column): DataFrame = {
    val keep = df.columns.map(col)
    df.withColumn("__req", from_json(jsonCol, TracesSchema))
      .select(keep :+ explode(col("__req.resourceSpans")).as("__rs"): _*)
      .select(keep ++ Seq(col("__rs.resource.attributes").as("__rattrs"),
        explode(col("__rs.scopeSpans")).as("__ss")): _*)
      .select(keep ++ Seq(col("__rattrs"), col("__ss.scope").as("__scope"),
        explode(col("__ss.spans")).as("__sp")): _*)
      .select(keep ++ Seq(
        kvToMap(col("__rattrs")).as("resource_attributes"),
        col("__scope.name").as("scope_name"),
        col("__sp.traceId").as("trace_id"),
        col("__sp.spanId").as("span_id"),
        // absent parent ⇒ root span; keep NULL (the reference packs an
        // empty string only for protobuf's zero-bytes case)
        col("__sp.parentSpanId").as("parent_span_id"),
        col("__sp.traceState").as("trace_state"),
        col("__sp.name").as("name"),
        coalesce(col("__sp.kind"), lit(0)).as("kind"),
        col("__sp.startTimeUnixNano").cast("long").as("start_unix_nano"),
        col("__sp.endTimeUnixNano").cast("long").as("end_unix_nano"),
        kvToMap(col("__sp.attributes")).as("attributes"),
        transform(col("__sp.events"), e => struct(
            e.getField("timeUnixNano").cast("long").as("ts_unix_nano"),
            e.getField("name").as("name"),
            kvToMap(e.getField("attributes")).as("attributes")))
          .as("events"),
        coalesce(size(col("__sp.links")), lit(0)).as("link_count"),
        coalesce(col("__sp.status.code"), lit(0)).as("status_code"),
        col("__sp.status.message").as("status_message")): _*)
  }
}
