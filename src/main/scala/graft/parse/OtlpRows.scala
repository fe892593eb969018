package graft.parse

import scala.collection.immutable.ListMap
import scala.collection.mutable.ArrayBuffer

import Proto.Reader

/** Direct OTLP decode — wire bytes straight to flat rows, one pass.
  *
  * The reference parses OTLP protobuf directly into its event model
  * (`plugins/in_opentelemetry/opentelemetry_prot.c:964-1010` →
  * `opentelemetry_logs.c` / `flb_opentelemetry_metrics.c`); the earlier
  * path here rendered each binary body to an intermediate proto3-JSON
  * string and re-parsed it with `from_json` — parse→print→parse, three
  * traversals plus an MB-scale string allocation per body on the hot
  * ingest path. These readers walk the message once and emit the final
  * flat rows ([[LogRow]]/[[MetricRow]]/[[SpanRow]]), with a Jackson
  * twin for `application/json` bodies so both wire formats share one
  * row assembler and land in identical rows by construction.
  *
  * Row semantics are pinned to [[Otlp.decodeLogs]]/[[Otlp.decodeMetrics]]/
  * [[Otlp.decodeTraces]] (the from_json path, still used for pure-JSON
  * frames): proto3 scalar defaults (0 / empty) decode as ABSENT (null),
  * the effective-time rule is `timeUnixNano > 0 ? time : observed`
  * (opentelemetry_logs.c:654-669), severity keeps only the valid OTLP
  * range 1..24 (:313), ids render as lowercase hex, and empty attribute
  * lists stay null maps. Unsigned-64 values that exceed Long.MaxValue
  * decode as null, exactly like the former unsigned-string→cast path.
  *
  * Scale shape: map-only — gunzip + one bounded walk per POST body, no
  * shuffle, no driver state; one body never needs to be wider than one
  * task.
  */
object OtlpRows {

  // ------------------------------------------------------------ row model
  /** Column set and order of [[Otlp.decodeLogs]]. */
  final case class LogRow(
      resource_attributes: Map[String, String],
      scope_name: String,
      scope_version: String,
      ts_unix_nano: Option[Long],
      time_unix_nano: Option[Long],
      observed_time_unix_nano: Option[Long],
      severity_number: Option[Int],
      severity_text: String,
      body: String,
      attributes: Map[String, String],
      trace_id: String,
      span_id: String,
      trace_flags: Int,
      event_name: String)

  final case class QuantileRow(quantile: Option[Double], value: Option[Double])

  /** Column set and order of [[Otlp.decodeMetrics]]. */
  final case class MetricRow(
      resource_attributes: Map[String, String],
      scope_name: String,
      name: String,
      description: String,
      unit: String,
      metric_type: String,
      temporality: Option[Int],
      is_monotonic: Option[Boolean],
      labels: Map[String, String],
      start_unix_nano: Option[Long],
      ts_unix_nano: Option[Long],
      value: Option[Double],
      count: Option[Long],
      sum: Option[Double],
      bucket_counts: Option[Seq[Long]],
      explicit_bounds: Option[Seq[Double]],
      quantiles: Option[Seq[QuantileRow]])

  final case class SpanEventRow(ts_unix_nano: Option[Long], name: String,
                                attributes: Map[String, String])

  /** Column set and order of [[Otlp.decodeTraces]]. */
  final case class SpanRow(
      resource_attributes: Map[String, String],
      scope_name: String,
      trace_id: String,
      span_id: String,
      parent_span_id: String,
      trace_state: String,
      name: String,
      kind: Int,
      start_unix_nano: Option[Long],
      end_unix_nano: Option[Long],
      attributes: Map[String, String],
      events: Option[Seq[SpanEventRow]],
      link_count: Int,
      status_code: Int,
      status_message: String)

  // --------------------------------------------------------- shared rules
  /** uint64 wire value → column value: absent when 0 (proto3 default)
    * or when the unsigned value exceeds Long.MaxValue (reads negative
    * here) — the same null the old unsigned-string→cast-long path gave.
    */
  private def u64(v: Long): Option[Long] = if (v > 0L) Some(v) else None

  /** Effective event time + range-gated severity, shared by both wire
    * formats (opentelemetry_logs.c:654-669, :313).
    */
  private def mkLogRow(rattrs: Map[String, String], sname: String,
                       sver: String, t: Option[Long], o: Option[Long],
                       sev: Option[Int], sevText: String, body: String,
                       attrs: Map[String, String], traceId: String,
                       spanId: String, flags: Int,
                       eventName: String): LogRow =
    LogRow(rattrs, sname, sver,
      ts_unix_nano = t.filter(_ > 0L).orElse(o),
      time_unix_nano = t,
      observed_time_unix_nano = o,
      severity_number = sev.filter(n => n >= 1 && n <= 24),
      severity_text = sevText, body = body, attributes = attrs,
      trace_id = traceId, span_id = spanId,
      trace_flags = flags & 255, event_name = eventName)

  private def hex(b: Array[Byte]): String = {
    if (b == null || b.isEmpty) return null
    val sb = new java.lang.StringBuilder(b.length * 2)
    var i = 0
    while (i < b.length) { sb.append(f"${b(i) & 0xff}%02x"); i += 1 }
    sb.toString
  }

  /** Double → its Spark string-cast rendering; proto3-JSON maps
    * NaN/Inf to strings our double DDL can't read, so those are absent.
    */
  private def dblStr(v: Double): String =
    if (java.lang.Double.isFinite(v)) java.lang.Double.toString(v) else null

  /** Attribute entries → map; empty stays null (the reference omits
    * absent attribute maps). ListMap keeps wire order like
    * map_from_entries does; later duplicates win.
    */
  private def kvMap(entries: ArrayBuffer[(String, String)]): Map[String, String] =
    if (entries.isEmpty) null else ListMap.from(entries)

  // ------------------------------------------------------------ pb: common
  /** AnyValue → string rendering, branch priority string > int > double
    * > bool (the [[Otlp]] `anyToString` coalesce order, not encounter
    * order); non-finite doubles fall through like their JSON nulls.
    */
  private def anyValueStr(r: Reader): String = {
    var sv: String = null; var iv: String = null
    var dv: String = null; var bv: String = null
    while (r.hasMore) {
      val k = r.varint()
      ((k >> 3).toInt, (k & 7).toInt) match {
        case (1, 2) => sv = r.strField()
        case (2, 0) => bv = if (r.varint() != 0L) "true" else "false"
        case (3, 0) => iv = r.varint().toString
        case (4, 1) => dv = dblStr(r.double())
        case (_, w) => r.skip(w)
      }
    }
    if (sv != null) sv else if (iv != null) iv
    else if (dv != null) dv else bv
  }

  /** One KeyValue { key=1, value=2 } appended to the entry buffer. */
  private def kvEntry(r: Reader, out: ArrayBuffer[(String, String)]): Unit = {
    var key: String = null; var value: String = null
    while (r.hasMore) {
      val k = r.varint()
      ((k >> 3).toInt, (k & 7).toInt) match {
        case (1, 2) => key = r.strField()
        case (2, 2) => value = anyValueStr(r.lenSlice())
        case (_, w) => r.skip(w)
      }
    }
    if (key != null) out += ((key, value))
  }

  /** Resource { attributes=1 } → map (null when empty). */
  private def resourceAttrs(r: Reader): Map[String, String] = {
    val kvs = ArrayBuffer.empty[(String, String)]
    while (r.hasMore) {
      val k = r.varint()
      ((k >> 3).toInt, (k & 7).toInt) match {
        case (1, 2) => kvEntry(r.lenSlice(), kvs)
        case (_, w) => r.skip(w)
      }
    }
    kvMap(kvs)
  }

  /** InstrumentationScope { name=1, version=2 }. */
  private def scopeNameVer(r: Reader): (String, String) = {
    var n: String = null; var v: String = null
    while (r.hasMore) {
      val k = r.varint()
      ((k >> 3).toInt, (k & 7).toInt) match {
        case (1, 2) => n = r.strField()
        case (2, 2) => v = r.strField()
        case (_, w) => r.skip(w)
      }
    }
    (n, v)
  }

  /** Shared Resource{Logs,Metrics,Spans} walk: resource=1 (may
    * interleave with the repeated scope list), scopes=2; inner scope
    * envelope: scope=1, items=2. Emission order matches the wire order,
    * like the exploded JSON path.
    */
  private def walkEnvelope(raw: Array[Byte])(
      emit: (Map[String, String], String, String, Reader) => Unit): Unit = {
    val root = new Reader(raw)
    while (root.hasMore) {
      val k = root.varint()
      ((k >> 3).toInt, (k & 7).toInt) match {
        case (1, 2) =>
          val rl = root.lenSlice()
          var rattrs: Map[String, String] = null
          val scopes = ArrayBuffer.empty[Reader]
          while (rl.hasMore) {
            val rk = rl.varint()
            ((rk >> 3).toInt, (rk & 7).toInt) match {
              case (1, 2) => rattrs = resourceAttrs(rl.lenSlice())
              case (2, 2) => scopes += rl.lenSlice()
              case (_, w) => rl.skip(w)
            }
          }
          scopes.foreach { sl =>
            var sname: String = null; var sver: String = null
            val items = ArrayBuffer.empty[Reader]
            while (sl.hasMore) {
              val sk = sl.varint()
              ((sk >> 3).toInt, (sk & 7).toInt) match {
                case (1, 2) =>
                  val nv = scopeNameVer(sl.lenSlice())
                  sname = nv._1; sver = nv._2
                case (2, 2) => items += sl.lenSlice()
                case (_, w) => sl.skip(w)
              }
            }
            items.foreach(emit(rattrs, sname, sver, _))
          }
        case (_, w) => root.skip(w)
      }
    }
  }

  // -------------------------------------------------------------- pb: logs
  /** ExportLogsServiceRequest bytes → flat log rows (field numbers per
    * the public opentelemetry-proto logs.proto, see [[OtlpProto]]).
    * Throws on malformed input — the caller drops the body like the
    * reference answers 400.
    */
  def logsFromPb(raw: Array[Byte]): Seq[LogRow] = {
    val out = ArrayBuffer.empty[LogRow]
    walkEnvelope(raw) { (rattrs, sname, sver, r) =>
      var timeNano = 0L; var obsNano = 0L; var sev = 0L
      var sevText: String = null; var body: String = null
      var flags = 0; var traceId: String = null; var spanId: String = null
      var eventName: String = null
      val kvs = ArrayBuffer.empty[(String, String)]
      while (r.hasMore) {
        val k = r.varint()
        ((k >> 3).toInt, (k & 7).toInt) match {
          case (1, 1) => timeNano = r.fixed64()
          case (2, 0) => sev = r.varint()
          case (3, 2) => sevText = r.strField()
          case (5, 2) => body = anyValueStr(r.lenSlice())
          case (6, 2) => kvEntry(r.lenSlice(), kvs)
          case (8, 5) => flags = r.fixed32()
          case (9, 2) => traceId = hex(r.bytesField())
          case (10, 2) => spanId = hex(r.bytesField())
          case (11, 1) => obsNano = r.fixed64()
          case (12, 2) => eventName = r.strField()
          case (_, w) => r.skip(w)
        }
      }
      out += mkLogRow(rattrs, sname, sver, u64(timeNano), u64(obsNano),
        if (sev != 0L && sev >= Int.MinValue && sev <= Int.MaxValue)
          Some(sev.toInt) else None,
        sevText, body, kvMap(kvs), traceId, spanId, flags, eventName)
    }
    out.toSeq
  }

  // ----------------------------------------------------------- pb: metrics
  /** ExportMetricsServiceRequest bytes → one flat row per data point,
    * kinds emitted in gauge/sum/histogram/summary order per metric (the
    * decode-path concat order).
    */
  def metricsFromPb(raw: Array[Byte]): Seq[MetricRow] = {
    val out = ArrayBuffer.empty[MetricRow]
    walkEnvelope(raw) { (rattrs, sname, _, mr) =>
      var name: String = null; var desc: String = null; var unit: String = null
      // each branch buffers (points, temporality, monotonic)
      val gauge = ArrayBuffer.empty[Reader]
      val sum = ArrayBuffer.empty[Reader]
      val hist = ArrayBuffer.empty[Reader]
      val summ = ArrayBuffer.empty[Reader]
      var sumTemp: Option[Int] = None; var sumMono: Option[Boolean] = None
      var histTemp: Option[Int] = None
      while (mr.hasMore) {
        val k = mr.varint()
        ((k >> 3).toInt, (k & 7).toInt) match {
          case (1, 2) => name = mr.strField()
          case (2, 2) => desc = mr.strField()
          case (3, 2) => unit = mr.strField()
          case (5, 2) => // Gauge { data_points=1 }
            val gr = mr.lenSlice()
            while (gr.hasMore) {
              val gk = gr.varint()
              ((gk >> 3).toInt, (gk & 7).toInt) match {
                case (1, 2) => gauge += gr.lenSlice()
                case (_, w) => gr.skip(w)
              }
            }
          case (7, 2) => // Sum { data_points=1, temporality=2, monotonic=3 }
            val sr = mr.lenSlice()
            while (sr.hasMore) {
              val sk = sr.varint()
              ((sk >> 3).toInt, (sk & 7).toInt) match {
                case (1, 2) => sum += sr.lenSlice()
                case (2, 0) =>
                  val t = sr.varint()
                  sumTemp = Some(t.toInt)
                case (3, 0) => sumMono = Some(sr.varint() != 0L)
                case (_, w) => sr.skip(w)
              }
            }
          case (9, 2) => // Histogram { data_points=1, temporality=2 }
            val hr = mr.lenSlice()
            while (hr.hasMore) {
              val hk = hr.varint()
              ((hk >> 3).toInt, (hk & 7).toInt) match {
                case (1, 2) => hist += hr.lenSlice()
                case (2, 0) => histTemp = Some(hr.varint().toInt)
                case (_, w) => hr.skip(w)
              }
            }
          case (11, 2) => // Summary { data_points=1 }
            val ur = mr.lenSlice()
            while (ur.hasMore) {
              val uk = ur.varint()
              ((uk >> 3).toInt, (uk & 7).toInt) match {
                case (1, 2) => summ += ur.lenSlice()
                case (_, w) => ur.skip(w)
              }
            }
          case (_, w) => mr.skip(w)
        }
      }
      def base(kind: String, temp: Option[Int], mono: Option[Boolean]) =
        MetricRow(rattrs, sname, name, desc, unit, kind, temp, mono,
          labels = null, start_unix_nano = None, ts_unix_nano = None,
          value = None, count = None, sum = None, bucket_counts = None,
          explicit_bounds = None, quantiles = None)
      gauge.foreach(dp => out += numberDp(dp, base("gauge", None, None)))
      sum.foreach(dp => out += numberDp(dp, base("sum", sumTemp, sumMono)))
      hist.foreach(dp => out += histDp(dp, base("histogram", histTemp, None)))
      summ.foreach(dp => out += summDp(dp, base("summary", None, None)))
    }
    out.toSeq
  }

  /** NumberDataPoint: start=2, time=3, as_double=4, as_int=6 sfixed64,
    * attributes=7. asDouble wins over asInt (the decode coalesce,
    * flb_opentelemetry_metrics.c:721-727); a non-finite asDouble falls
    * through to asInt like its JSON null.
    */
  private def numberDp(r: Reader, base: MetricRow): MetricRow = {
    var start = 0L; var time = 0L
    var dv: Option[Double] = None; var iv: Option[Double] = None
    val kvs = ArrayBuffer.empty[(String, String)]
    while (r.hasMore) {
      val k = r.varint()
      ((k >> 3).toInt, (k & 7).toInt) match {
        case (2, 1) => start = r.fixed64()
        case (3, 1) => time = r.fixed64()
        case (4, 1) =>
          val v = r.double()
          dv = if (java.lang.Double.isFinite(v)) Some(v) else None
        case (6, 1) => iv = Some(r.fixed64().toDouble)
        case (7, 2) => kvEntry(r.lenSlice(), kvs)
        case (_, w) => r.skip(w)
      }
    }
    base.copy(labels = kvMap(kvs), start_unix_nano = u64(start),
      ts_unix_nano = u64(time), value = dv.orElse(iv))
  }

  /** HistogramDataPoint: start=2, time=3, count=4 fixed64, sum=5,
    * bucket_counts=6 (packed or not), explicit_bounds=7, attributes=9.
    */
  private def histDp(r: Reader, base: MetricRow): MetricRow = {
    var start = 0L; var time = 0L; var count = 0L
    var sum: Option[Double] = None
    val buckets = ArrayBuffer.empty[Long]
    val bounds = ArrayBuffer.empty[Double]
    val kvs = ArrayBuffer.empty[(String, String)]
    while (r.hasMore) {
      val k = r.varint()
      ((k >> 3).toInt, (k & 7).toInt) match {
        case (2, 1) => start = r.fixed64()
        case (3, 1) => time = r.fixed64()
        case (4, 1) => count = r.fixed64()
        case (5, 1) =>
          val v = r.double()
          sum = if (java.lang.Double.isFinite(v)) Some(v) else None
        case (6, 2) => val pr = r.lenSlice(); while (pr.hasMore) buckets += pr.fixed64()
        case (6, 1) => buckets += r.fixed64()
        case (7, 2) => val pr = r.lenSlice(); while (pr.hasMore) bounds += pr.double()
        case (7, 1) => bounds += r.double()
        case (9, 2) => kvEntry(r.lenSlice(), kvs)
        case (_, w) => r.skip(w)
      }
    }
    base.copy(labels = kvMap(kvs), start_unix_nano = u64(start),
      ts_unix_nano = u64(time),
      count = if (count >= 0L) Some(count) else None,
      sum = sum,
      bucket_counts = if (buckets.nonEmpty) Some(buckets.toSeq) else None,
      explicit_bounds = if (bounds.nonEmpty) Some(bounds.toSeq) else None)
  }

  /** SummaryDataPoint: start=2, time=3, count=4, sum=5,
    * quantile_values=6 { quantile=1, value=2 }, attributes=7.
    */
  private def summDp(r: Reader, base: MetricRow): MetricRow = {
    var start = 0L; var time = 0L; var count = 0L
    var sum: Option[Double] = None
    val qs = ArrayBuffer.empty[QuantileRow]
    val kvs = ArrayBuffer.empty[(String, String)]
    while (r.hasMore) {
      val k = r.varint()
      ((k >> 3).toInt, (k & 7).toInt) match {
        case (2, 1) => start = r.fixed64()
        case (3, 1) => time = r.fixed64()
        case (4, 1) => count = r.fixed64()
        case (5, 1) =>
          val v = r.double()
          sum = if (java.lang.Double.isFinite(v)) Some(v) else None
        case (6, 2) =>
          val qr = r.lenSlice()
          var q: Option[Double] = None; var v: Option[Double] = None
          while (qr.hasMore) {
            val qk = qr.varint()
            ((qk >> 3).toInt, (qk & 7).toInt) match {
              case (1, 1) =>
                val d = qr.double()
                q = if (java.lang.Double.isFinite(d)) Some(d) else None
              case (2, 1) =>
                val d = qr.double()
                v = if (java.lang.Double.isFinite(d)) Some(d) else None
              case (_, w) => qr.skip(w)
            }
          }
          qs += QuantileRow(q, v)
        case (7, 2) => kvEntry(r.lenSlice(), kvs)
        case (_, w) => r.skip(w)
      }
    }
    base.copy(labels = kvMap(kvs), start_unix_nano = u64(start),
      ts_unix_nano = u64(time),
      count = if (count >= 0L) Some(count) else None,
      sum = sum,
      quantiles = if (qs.nonEmpty) Some(qs.toSeq) else None)
  }

  // ------------------------------------------------------------ pb: traces
  /** ExportTraceServiceRequest bytes → one flat row per span. */
  def tracesFromPb(raw: Array[Byte]): Seq[SpanRow] = {
    val out = ArrayBuffer.empty[SpanRow]
    walkEnvelope(raw) { (rattrs, sname, _, r) =>
      var traceId: String = null; var spanId: String = null
      var parent: String = null; var state: String = null
      var name: String = null; var kind = 0L; var start = 0L; var end = 0L
      var statusMsg: String = null; var statusCode = 0L
      val events = ArrayBuffer.empty[SpanEventRow]
      val kvs = ArrayBuffer.empty[(String, String)]
      var linkCount = 0
      while (r.hasMore) {
        val k = r.varint()
        ((k >> 3).toInt, (k & 7).toInt) match {
          case (1, 2) => traceId = hex(r.bytesField())
          case (2, 2) => spanId = hex(r.bytesField())
          case (3, 2) => state = r.strField()
          case (4, 2) => parent = hex(r.bytesField())
          case (5, 2) => name = r.strField()
          case (6, 0) => kind = r.varint()
          case (7, 1) => start = r.fixed64()
          case (8, 1) => end = r.fixed64()
          case (9, 2) => kvEntry(r.lenSlice(), kvs)
          case (11, 2) =>
            val er = r.lenSlice()
            var t = 0L; var ename: String = null
            val ekvs = ArrayBuffer.empty[(String, String)]
            while (er.hasMore) {
              val ek = er.varint()
              ((ek >> 3).toInt, (ek & 7).toInt) match {
                case (1, 1) => t = er.fixed64()
                case (2, 2) => ename = er.strField()
                case (3, 2) => kvEntry(er.lenSlice(), ekvs)
                case (_, w) => er.skip(w)
              }
            }
            events += SpanEventRow(u64(t), ename, kvMap(ekvs))
          case (13, 2) => r.skip(2); linkCount += 1
          case (15, 2) =>
            val sr = r.lenSlice()
            while (sr.hasMore) {
              val sk = sr.varint()
              ((sk >> 3).toInt, (sk & 7).toInt) match {
                case (2, 2) => statusMsg = sr.strField()
                case (3, 0) => statusCode = sr.varint()
                case (_, w) => sr.skip(w)
              }
            }
          case (_, w) => r.skip(w)
        }
      }
      out += SpanRow(rattrs, sname, traceId, spanId, parent, state, name,
        kind.toInt, u64(start), u64(end), kvMap(kvs),
        if (events.nonEmpty) Some(events.toSeq) else None,
        linkCount, statusCode.toInt, statusMsg)
    }
    out.toSeq
  }

  // -------------------------------------------------------- json (jackson)
  // The `application/json` twin: same rows from proto3-JSON bodies,
  // replacing the from_json hop so mixed-format batches stay one
  // map-only pass. Semantics mirror the DDL-schema read: missing keys
  // are null, uint64 strings parse signed (overflow → null), numbers
  // render like their Spark string-casts.

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper
  private type JNode = com.fasterxml.jackson.databind.JsonNode

  private def field(n: JNode, name: String): JNode = {
    if (n == null) return null
    val v = n.get(name)
    if (v == null || v.isNull) null else v
  }

  /** StringType read: text as-is, scalars via their text form. */
  private def asStr(v: JNode): String =
    if (v == null) null
    else if (v.isTextual) v.asText
    else if (v.isContainerNode) v.toString
    else v.asText

  private def strAt(n: JNode, name: String): String = asStr(field(n, name))

  private def parseLong(s: String): Option[Long] =
    if (s == null) None
    else try Some(java.lang.Long.parseLong(s.trim)) catch { case _: NumberFormatException => None }

  private def longAt(n: JNode, name: String): Option[Long] =
    parseLong(strAt(n, name))

  private def intAt(n: JNode, name: String): Option[Int] = {
    val v = field(n, name)
    if (v == null) None
    else if (v.isNumber) Some(v.intValue)
    else parseLong(asStr(v)).map(_.toInt)
  }

  private def dblAt(n: JNode, name: String): Option[Double] = {
    val v = field(n, name)
    if (v == null) None
    else if (v.isNumber) Some(v.doubleValue)
    else try Some(java.lang.Double.parseDouble(v.asText)) catch {
      case _: NumberFormatException => None
    }
  }

  private def boolAt(n: JNode, name: String): Option[Boolean] = {
    val v = field(n, name)
    if (v == null) None
    else if (v.isBoolean) Some(v.asBoolean)
    else None
  }

  /** AnyValue JSON → string (the anyToString coalesce order). */
  private def anyValueStrJson(v: JNode): String = {
    if (v == null) return null
    val sv = strAt(v, "stringValue")
    if (sv != null) return sv
    val iv = strAt(v, "intValue")
    if (iv != null) return iv
    val dv = dblAt(v, "doubleValue")
    if (dv.isDefined) return java.lang.Double.toString(dv.get)
    boolAt(v, "boolValue").map(b => if (b) "true" else "false").orNull
  }

  /** KeyValue[] JSON → map; absent → null, `[]` → empty map (matching
    * `kvToMap` over from_json output).
    */
  private def kvMapJson(arr: JNode): Map[String, String] = {
    if (arr == null || !arr.isArray) return null
    val out = ArrayBuffer.empty[(String, String)]
    arr.forEach { e =>
      val key = strAt(e, "key")
      out += ((key, anyValueStrJson(field(e, "value"))))
    }
    ListMap.from(out)
  }

  private def each(n: JNode)(f: JNode => Unit): Unit =
    if (n != null && n.isArray) n.forEach(e => f(e))

  /** Shared resource/scope JSON walk for all three signals. */
  private def walkEnvelopeJson(raw: Array[Byte], topField: String,
                               scopesField: String, itemsField: String)(
      emit: (Map[String, String], String, String, JNode) => Unit): Unit = {
    val root = mapper.readTree(raw)
    each(field(root, topField)) { rl =>
      val rattrs = kvMapJson(field(field(rl, "resource"), "attributes"))
      each(field(rl, scopesField)) { sl =>
        val scope = field(sl, "scope")
        val sname = strAt(scope, "name")
        val sver = strAt(scope, "version")
        each(field(sl, itemsField))(item => emit(rattrs, sname, sver, item))
      }
    }
  }

  /** proto3-JSON ExportLogsServiceRequest → flat log rows. */
  def logsFromJson(raw: Array[Byte]): Seq[LogRow] = {
    val out = ArrayBuffer.empty[LogRow]
    walkEnvelopeJson(raw, "resourceLogs", "scopeLogs", "logRecords") {
      (rattrs, sname, sver, lr) =>
        out += mkLogRow(rattrs, sname, sver,
          longAt(lr, "timeUnixNano"), longAt(lr, "observedTimeUnixNano"),
          intAt(lr, "severityNumber"), strAt(lr, "severityText"),
          anyValueStrJson(field(lr, "body")),
          kvMapJson(field(lr, "attributes")),
          strAt(lr, "traceId"), strAt(lr, "spanId"),
          intAt(lr, "flags").getOrElse(0), strAt(lr, "eventName"))
    }
    out.toSeq
  }

  /** proto3-JSON ExportMetricsServiceRequest → flat point rows. */
  def metricsFromJson(raw: Array[Byte]): Seq[MetricRow] = {
    val out = ArrayBuffer.empty[MetricRow]
    walkEnvelopeJson(raw, "resourceMetrics", "scopeMetrics", "metrics") {
      (rattrs, sname, _, m) =>
        val name = strAt(m, "name")
        val desc = strAt(m, "description")
        val unit = strAt(m, "unit")
        def base(kind: String, temp: Option[Int], mono: Option[Boolean]) =
          MetricRow(rattrs, sname, name, desc, unit, kind, temp, mono,
            labels = null, start_unix_nano = None, ts_unix_nano = None,
            value = None, count = None, sum = None, bucket_counts = None,
            explicit_bounds = None, quantiles = None)
        def common(dp: JNode, b: MetricRow): MetricRow =
          b.copy(labels = kvMapJson(field(dp, "attributes")),
            start_unix_nano = longAt(dp, "startTimeUnixNano"),
            ts_unix_nano = longAt(dp, "timeUnixNano"))
        val gauge = field(m, "gauge")
        each(field(gauge, "dataPoints")) { dp =>
          out += common(dp, base("gauge", None, None)).copy(
            value = dblAt(dp, "asDouble")
              .orElse(parseLong(strAt(dp, "asInt")).map(_.toDouble)))
        }
        val sum = field(m, "sum")
        each(field(sum, "dataPoints")) { dp =>
          out += common(dp, base("sum", intAt(sum, "aggregationTemporality"),
            boolAt(sum, "isMonotonic"))).copy(
            value = dblAt(dp, "asDouble")
              .orElse(parseLong(strAt(dp, "asInt")).map(_.toDouble)))
        }
        val hist = field(m, "histogram")
        each(field(hist, "dataPoints")) { dp =>
          val buckets = ArrayBuffer.empty[Long]
          each(field(dp, "bucketCounts"))(b =>
            parseLong(asStr(b)).foreach(buckets += _))
          val bounds = ArrayBuffer.empty[Double]
          each(field(dp, "explicitBounds")) { b =>
            if (b.isNumber) bounds += b.doubleValue
          }
          out += common(dp, base("histogram",
            intAt(hist, "aggregationTemporality"), None)).copy(
            count = longAt(dp, "count"), sum = dblAt(dp, "sum"),
            bucket_counts = if (buckets.nonEmpty) Some(buckets.toSeq) else None,
            explicit_bounds = if (bounds.nonEmpty) Some(bounds.toSeq) else None)
        }
        val summ = field(m, "summary")
        each(field(summ, "dataPoints")) { dp =>
          val qs = ArrayBuffer.empty[QuantileRow]
          each(field(dp, "quantileValues"))(q =>
            qs += QuantileRow(dblAt(q, "quantile"), dblAt(q, "value")))
          out += common(dp, base("summary", None, None)).copy(
            count = longAt(dp, "count"), sum = dblAt(dp, "sum"),
            quantiles = if (qs.nonEmpty) Some(qs.toSeq) else None)
        }
    }
    out.toSeq
  }

  /** proto3-JSON ExportTraceServiceRequest → flat span rows. */
  def tracesFromJson(raw: Array[Byte]): Seq[SpanRow] = {
    val out = ArrayBuffer.empty[SpanRow]
    walkEnvelopeJson(raw, "resourceSpans", "scopeSpans", "spans") {
      (rattrs, sname, _, sp) =>
        val events = ArrayBuffer.empty[SpanEventRow]
        var hasEvents = false
        val evArr = field(sp, "events")
        if (evArr != null && evArr.isArray) {
          hasEvents = true
          evArr.forEach { e =>
            events += SpanEventRow(longAt(e, "timeUnixNano"),
              strAt(e, "name"), kvMapJson(field(e, "attributes")))
          }
        }
        val links = field(sp, "links")
        val status = field(sp, "status")
        out += SpanRow(rattrs, sname,
          strAt(sp, "traceId"), strAt(sp, "spanId"),
          strAt(sp, "parentSpanId"), strAt(sp, "traceState"),
          strAt(sp, "name"), intAt(sp, "kind").getOrElse(0),
          longAt(sp, "startTimeUnixNano"), longAt(sp, "endTimeUnixNano"),
          kvMapJson(field(sp, "attributes")),
          if (hasEvents) Some(events.toSeq) else None,
          if (links != null && links.isArray) links.size else 0,
          intAt(status, "code").getOrElse(0), strAt(status, "message"))
    }
    out.toSeq
  }
}
