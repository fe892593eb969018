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
}
