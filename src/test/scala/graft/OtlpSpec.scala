package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.parse.Otlp

/** Edge cases of the OTLP/HTTP metrics + traces decoders
  * (flb_opentelemetry_metrics.c / flb_opentelemetry_traces.c): the gated
  * round-trip queries cover the bulk shapes; these pin field-level rules
  * that the generated fixture never exercises.
  */
class OtlpSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("metrics: asDouble wins over asInt; asInt alone parses; gauge has no temporality") {
    val body =
      """{"resourceMetrics":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"svc"}}]},
        |"scopeMetrics":[{"scope":{"name":"s","version":"1"},"metrics":[
        |{"name":"m1","gauge":{"dataPoints":[
        |  {"timeUnixNano":"1000","asDouble":2.5,"asInt":"7"},
        |  {"timeUnixNano":"2000","asInt":"7"}]}}]}]}]}""".stripMargin.replace("\n", "")
    val out = Otlp.decodeMetrics(Seq(body).toDF("__body"), col("__body"))
      .orderBy("ts_unix_nano").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("value") == 2.5) // decode order :721-727
    assert(out(1).getAs[Double]("value") == 7.0)
    assert(out(0).getAs[String]("metric_type") == "gauge")
    assert(out(0).isNullAt(out(0).fieldIndex("temporality")))
    assert(out(0).isNullAt(out(0).fieldIndex("is_monotonic")))
  }

  test("metrics: one scope carrying all four kinds explodes into one row per point") {
    val body =
      """{"resourceMetrics":[{"resource":{},"scopeMetrics":[{"metrics":[
        |{"name":"g","gauge":{"dataPoints":[{"timeUnixNano":"1","asDouble":1.0}]}},
        |{"name":"c","sum":{"dataPoints":[{"timeUnixNano":"2","asInt":"3"}],
        |  "aggregationTemporality":2,"isMonotonic":true}},
        |{"name":"h","histogram":{"dataPoints":[{"timeUnixNano":"3","count":"4",
        |  "sum":10.0,"bucketCounts":["1","3"],"explicitBounds":[5.0]}],
        |  "aggregationTemporality":1}},
        |{"name":"q","summary":{"dataPoints":[{"timeUnixNano":"4","count":"4",
        |  "sum":10.0,"quantileValues":[{"quantile":0.5,"value":2.0}]}]}}]}]}]}"""
        .stripMargin.replace("\n", "")
    val out = Otlp.decodeMetrics(Seq(body).toDF("__body"), col("__body"))
      .orderBy("ts_unix_nano").collect()
    assert(out.map(_.getAs[String]("metric_type")).toSeq ==
      Seq("gauge", "sum", "histogram", "summary"))
    val sum = out(1)
    assert(sum.getAs[Int]("temporality") == 2 && sum.getAs[Boolean]("is_monotonic"))
    val hist = out(2)
    assert(hist.getAs[Long]("count") == 4L)
    assert(hist.getAs[collection.Seq[Long]]("bucket_counts") == Seq(1L, 3L))
    assert(hist.getAs[collection.Seq[Double]]("explicit_bounds") == Seq(5.0))
    assert(hist.getAs[Int]("temporality") == 1)
    val summ = out(3)
    assert(summ.getAs[collection.Seq[org.apache.spark.sql.Row]]("quantiles")
      .map(r => (r.getDouble(0), r.getDouble(1))) == Seq((0.5, 2.0)))
  }

  test("traces: absent parent/status/events decode to root-span defaults") {
    val body =
      """{"resourceSpans":[{"resource":{},"scopeSpans":[{"spans":[
        |{"traceId":"aa","spanId":"bb","name":"op",
        | "startTimeUnixNano":"10","endTimeUnixNano":"20"}]}]}]}"""
        .stripMargin.replace("\n", "")
    val r = Otlp.decodeTraces(Seq(body).toDF("__body"), col("__body")).collect()(0)
    assert(r.getAs[String]("trace_id") == "aa")
    assert(r.isNullAt(r.fieldIndex("parent_span_id"))) // root span
    assert(r.getAs[Int]("kind") == 0)                  // UNSPECIFIED
    assert(r.getAs[Int]("status_code") == 0)           // UNSET
    assert(r.getAs[Int]("link_count") == 0)
    assert(r.isNullAt(r.fieldIndex("events")))
    assert(r.getAs[Long]("start_unix_nano") == 10L)
  }

  test("traces: span events and links flatten with counts") {
    val body =
      """{"resourceSpans":[{"resource":{},"scopeSpans":[{"spans":[
        |{"traceId":"aa","spanId":"bb","name":"op",
        | "startTimeUnixNano":"10","endTimeUnixNano":"20",
        | "events":[{"timeUnixNano":"15","name":"retry",
        |   "attributes":[{"key":"n","value":{"intValue":"2"}}]}],
        | "links":[{"traceId":"cc","spanId":"dd"},{"traceId":"ee","spanId":"ff"}],
        | "status":{"code":2,"message":"boom"}}]}]}]}"""
        .stripMargin.replace("\n", "")
    val r = Otlp.decodeTraces(Seq(body).toDF("__body"), col("__body")).collect()(0)
    assert(r.getAs[Int]("link_count") == 2)
    val evs = r.getAs[collection.Seq[org.apache.spark.sql.Row]]("events")
    assert(evs.length == 1 && evs(0).getAs[String]("name") == "retry")
    assert(evs(0).getAs[Map[String, String]]("attributes") == Map("n" -> "2"))
    assert(r.getAs[Int]("status_code") == 2)
    assert(r.getAs[String]("status_message") == "boom")
  }

  test("encodeMetrics: each metric carries exactly its own kind branch") {
    val flat = Seq(
      ("svc", "reqs", "sum", Some(2), Some(true), Map("h" -> "a"), 10L,
        Some(3.0)),
      ("svc", "temp", "gauge", None, None, Map("h" -> "a"), 11L, Some(21.5))
    ).toDF("service", "name", "metric_type", "temporality", "is_monotonic",
      "labels", "tsns", "value")
    val nul = lit(null)
    val body = Otlp.encodeMetrics(flat,
      resourceAttrs = map(lit("service.name"), col("service")),
      scopeName = lit("s"), scopeVersion = lit("1"), name = col("name"),
      metricType = col("metric_type"), temporality = col("temporality"),
      isMonotonic = col("is_monotonic"), labels = col("labels"),
      tsUnixNano = col("tsns"), value = col("value"), count = nul,
      sum = nul, bucketCounts = nul.cast("array<bigint>"),
      explicitBounds = nul.cast("array<double>"),
      quantiles = nul.cast("array<struct<quantile double, value double>>"))
      .collect()(0).getString(0)
    // one body for the shared resource; the sum metric must not leak a
    // gauge/histogram/summary branch (proto3-JSON oneof absence) and
    // vice versa
    assert(body.contains(""""isMonotonic":true"""))
    assert(body.contains(""""aggregationTemporality":2"""))
    assert(!body.contains("histogram") && !body.contains("summary"))
    assert(body.indexOf("resourceMetrics") == body.lastIndexOf("resourceMetrics"))
    val back = Otlp.decodeMetrics(Seq(body).toDF("__b"), col("__b"))
      .orderBy("name").collect()
    assert(back.length == 2)
    assert(back(0).getAs[String]("metric_type") == "sum"
      || back(1).getAs[String]("metric_type") == "sum")
    assert(back.exists(r => r.getAs[String]("metric_type") == "gauge"
      && r.isNullAt(r.fieldIndex("temporality"))))
  }

  test("encodeTraces: span events nest and null events stay absent") {
    val flat = Seq(
      ("svc", "t1", "s1", Some(Seq(("5".toLong, "retry", Map("n" -> "2"))))),
      ("svc", "t2", "s2", None)
    ).toDF("service", "tid", "sid", "evs")
      .withColumn("evs", col("evs").cast(
        "array<struct<ts_unix_nano long, name string, attributes map<string,string>>>"))
    val body = Otlp.encodeTraces(flat,
      resourceAttrs = map(lit("service.name"), col("service")),
      scopeName = lit("s"), scopeVersion = lit("1"), traceId = col("tid"),
      spanId = col("sid"), parentSpanId = lit(null).cast("string"),
      traceState = lit(null).cast("string"), name = lit("op"),
      kind = lit(1), startUnixNano = lit(10L), endUnixNano = lit(20L),
      attributes = map(), events = col("evs"), statusCode = lit(0),
      statusMessage = lit(null).cast("string"))
      .collect()(0).getString(0)
    val back = Otlp.decodeTraces(Seq(body).toDF("__b"), col("__b"))
      .orderBy("trace_id").collect()
    assert(back.length == 2)
    val withEv = back(0)
    val evs = withEv.getAs[collection.Seq[org.apache.spark.sql.Row]]("events")
    assert(evs.length == 1 && evs(0).getAs[String]("name") == "retry")
    assert(evs(0).getAs[Long]("ts_unix_nano") == 5L)
    assert(evs(0).getAs[Map[String, String]]("attributes") == Map("n" -> "2"))
    assert(back(1).isNullAt(back(1).fieldIndex("events")))
  }
}
