package graft

import java.io.OutputStreamWriter
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.HttpSink

/** HTTP-push sink: full-jitter backoff bounds, retry-until-success and
  * fail-fast-on-4xx against a scripted stub server, and a loopback e2e
  * into this engine's own HTTP push source (the same
  * sink→source proof pattern as the Forward relay test).
  */
class HttpSinkSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("full-jitter backoff stays within [base, min(cap, base*2^n)]") {
    val rnd = new java.util.Random(42)
    for (attempt <- 0 to 10; _ <- 1 to 50) {
      val w = HttpSink.backoffMs(100, 3000, attempt, rnd)
      val hi = math.max(100L, math.min(3000L, 100L << math.min(attempt, 30)))
      assert(w >= 100 && w <= hi, s"attempt=$attempt wait=$w hi=$hi")
    }
  }

  /** Stub HTTP server answering scripted status codes, counting posts. */
  private def stubServer(statuses: Seq[Int]): (Int, AtomicInteger, () => Unit) = {
    val server = new ServerSocket(0)
    val hits = new AtomicInteger(0)
    val t = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          try {
            val in = new java.io.BufferedInputStream(sock.getInputStream)
            var line = readLine(in)
            while (line != null) {
              var contentLength = 0
              var h = readLine(in)
              while (h != null && h.nonEmpty) {
                val i = h.indexOf(':')
                if (i > 0 && h.substring(0, i).equalsIgnoreCase("content-length"))
                  contentLength = h.substring(i + 1).trim.toInt
                h = readLine(in)
              }
              val body = new Array[Byte](contentLength)
              var read = 0
              while (read < contentLength) {
                val n = in.read(body, read, contentLength - read)
                if (n < 0) throw new java.io.EOFException
                read += n
              }
              val n = hits.getAndIncrement()
              val status = statuses.lift(n).getOrElse(statuses.last)
              val out = new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8)
              out.write(s"HTTP/1.1 $status X\r\nContent-Length: 0\r\n\r\n")
              out.flush()
              line = readLine(in)
            }
          } catch { case _: Throwable => } finally sock.close()
        }
      } catch { case _: Throwable => }
    })
    t.setDaemon(true)
    t.start()
    (server.getLocalPort, hits, () => server.close())
  }

  private def readLine(in: java.io.InputStream): String = {
    val sb = new java.lang.StringBuilder
    var b = in.read()
    while (b >= 0 && b != '\n') { if (b != '\r') sb.append(b.toChar); b = in.read() }
    if (b < 0 && sb.length() == 0) null else sb.toString
  }

  test("retry: two 500s then success — three attempts, delivered") {
    val (port, hits, close) = stubServer(Seq(500, 503, 201))
    try {
      val attempts = HttpSink.postWithRetry(
        s"http://127.0.0.1:$port/ingest", "x\n".getBytes("UTF-8"),
        maxRetries = 3, baseMs = 10, capMs = 50)
      assert(attempts == 3)
      assert(hits.get() == 3)
    } finally close()
  }

  test("permanent 4xx fails fast without retries") {
    val (port, hits, close) = stubServer(Seq(400))
    try {
      intercept[java.io.IOException] {
        HttpSink.postWithRetry(s"http://127.0.0.1:$port/ingest",
          "x\n".getBytes("UTF-8"), maxRetries = 3, baseMs = 10, capMs = 50)
      }
      assert(hits.get() == 1, "4xx must not be retried")
    } finally close()
  }

  test("retries exhausted on persistent 5xx throws after maxRetries+1 posts") {
    val (port, hits, close) = stubServer(Seq(500))
    try {
      intercept[java.io.IOException] {
        HttpSink.postWithRetry(s"http://127.0.0.1:$port/ingest",
          "x\n".getBytes("UTF-8"), maxRetries = 2, baseMs = 10, capMs = 50)
      }
      assert(hits.get() == 3)
    } finally close()
  }

  test("loopback e2e: HttpSink batches into this engine's HTTP source") {
    import org.apache.spark.sql.functions._
    val probe = new ServerSocket(0)
    val port = probe.getLocalPort
    probe.close()

    val src = graft.sources.Sources.httpLines(spark, port)
    val q = src.select(col("value")).writeStream.format("memory")
      .queryName("sink_loop").outputMode("append")
      .trigger(Trigger.ProcessingTime(100)).start()
    try {
      // wait for the source server to bind
      val deadline = System.currentTimeMillis + 30000
      var up = false
      while (!up && System.currentTimeMillis < deadline) {
        try { new java.net.Socket("127.0.0.1", port).close(); up = true }
        catch { case _: java.net.ConnectException => Thread.sleep(100) }
      }
      assert(up)
      val df = (1 to 6).map(i => s"""{"n":$i}""").toDF("value").repartition(2)
      HttpSink.write(df, s"http://127.0.0.1:$port/bulk", batchLines = 2)
      val want = (1 to 6).map(i => s"""{"n":$i}""").toSet
      val dl2 = System.currentTimeMillis + 30000
      while (spark.table("sink_loop").count() < 6 && System.currentTimeMillis < dl2)
        Thread.sleep(100)
      val got = spark.table("sink_loop").as[String].collect().toSet
      assert(got == want)
    } finally q.stop()
  }

  /** Start the engine's own HTTP source on a free port, run `body`
    * against it, and return the received `value` rows.
    */
  private def loopback(queryName: String, expectRows: Int)
                      (body: (Int) => Unit): Seq[String] = {
    import org.apache.spark.sql.functions._
    val probe = new ServerSocket(0)
    val port = probe.getLocalPort
    probe.close()
    val src = graft.sources.Sources.httpLines(spark, port)
    val q = src.select(col("value")).writeStream.format("memory")
      .queryName(queryName).outputMode("append")
      .trigger(Trigger.ProcessingTime(100)).start()
    try {
      val deadline = System.currentTimeMillis + 30000
      var up = false
      while (!up && System.currentTimeMillis < deadline) {
        try { new java.net.Socket("127.0.0.1", port).close(); up = true }
        catch { case _: java.net.ConnectException => Thread.sleep(100) }
      }
      assert(up)
      body(port)
      val dl2 = System.currentTimeMillis + 30000
      while (spark.table(queryName).count() < expectRows &&
             System.currentTimeMillis < dl2)
        Thread.sleep(100)
      spark.table(queryName).as[String].collect().toSeq
    } finally q.stop()
  }

  test("loopback e2e: writeDatadog round-trips datadogEvent, NULLs dropped") {
    import org.apache.spark.sql.functions._
    import graft.sinks.Formats
    val ev = Seq(
      (1000L, "h1", "msg one"),
      (2000L, "h2", "msg two"),
      (3000L, "h3", null)            // NULL message ⇒ whole line NULL below
    ).toDF("ts_ms", "host", "msg")
    val lines = ev.select(
      // to_json never returns NULL, so make the line itself NULL for the
      // null-message row to exercise the sink's NULL filter
      when(col("msg").isNotNull,
        Formats.datadogEvent(col("ts_ms"), lit("app"), lit("svc"),
          col("host"), lit("env:prod"), col("msg"))).as("value"))
    val got = loopback("dd_loop", 1) { port =>
      HttpSink.writeDatadog(lines.coalesce(1),
        s"http://127.0.0.1:$port/v2/logs", apiKey = "k", batchLines = 10)
    }
    // one POST body = one JSON array line; NULL row must not appear as
    // the literal "null"
    assert(got.size == 1)
    assert(!got.head.contains("null"))
    val parsed = Seq(got.head).toDF("body").select(explode(from_json(col("body"),
      org.apache.spark.sql.types.DataType.fromDDL(
        """array<struct<timestamp bigint, ddsource string, service string,
           hostname string, ddtags string, message string>>"""))).as("r"))
      .select(col("r.timestamp"), col("r.hostname"), col("r.message"))
      .as[(Long, String, String)].collect().toSet
    assert(parsed == Set((1000L, "h1", "msg one"), (2000L, "h2", "msg two")))
  }

  test("loopback e2e: writeBodies ships a lokiPush payload intact") {
    import org.apache.spark.sql.functions._
    import graft.sinks.Formats
    val ev = Seq((1L, "line a"), (2L, "line b")).toDF("ns", "line")
    val payload = ev.agg(collect_list(
        Formats.lokiValue(col("ns"), col("line"))).as("entries"))
      .select(Formats.lokiPush(
        Seq("job" -> lit("graft"), "host" -> lit("h1")),
        col("entries")).as("value"))
      // a NULL body row must be dropped, not POSTed as "null"
      .unionAll(Seq(1).toDF("x").select(lit(null).cast("string").as("value")))
    val got = loopback("loki_loop", 1) { port =>
      HttpSink.writeBodies(payload.coalesce(1),
        s"http://127.0.0.1:$port/loki/api/v1/push")
    }
    assert(got.size == 1)
    val body = got.head
    val labels = Seq(body).toDF("b")
      .select(from_json(get_json_object(col("b"), "$.streams[0].stream"),
        org.apache.spark.sql.types.DataType.fromDDL(
          "struct<job string, host string>")).as("s"))
      .select(col("s.job"), col("s.host")).as[(String, String)].head()
    assert(labels == ("graft", "h1"))
    val entries = Seq(body).toDF("b").select(explode(from_json(
        get_json_object(col("b"), "$.streams[0].values"),
        org.apache.spark.sql.types.DataType.fromDDL(
          "array<array<string>>"))).as("v"))
      .select(element_at(col("v"), 1), element_at(col("v"), 2))
      .as[(String, String)].collect().toSet
    assert(entries == Set(("1", "line a"), ("2", "line b")))
  }

  test("azure SharedKey auth: deterministic signature over the documented string-to-sign") {
    val key = java.util.Base64.getEncoder.encodeToString(
      "workspace-secret".getBytes("UTF-8"))
    val date = "Mon, 01 Jan 2024 00:00:00 GMT"
    val headers = HttpSink.azureSharedKeyAuth("ws-123", key, 42, date).toMap
    assert(headers.get("x-ms-date").contains(date))
    val auth = headers("Authorization")
    assert(auth.startsWith("SharedKey ws-123:"))
    // independent reference computation of the azure.c:230-280 string
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      "workspace-secret".getBytes("UTF-8"), "HmacSHA256"))
    val want = java.util.Base64.getEncoder.encodeToString(mac.doFinal(
      ("POST\n42\napplication/json\nx-ms-date:" + date + "\n/api/logs")
        .getBytes("UTF-8")))
    assert(auth == s"SharedKey ws-123:$want")
    // same inputs → same signature; different length → different one
    assert(HttpSink.azureSharedKeyAuth("ws-123", key, 42, date).toMap == headers)
    assert(HttpSink.azureSharedKeyAuth("ws-123", key, 43, date).toMap != headers)
  }

  test("loopback e2e: writeSplunkHec round-trips splunkHecEvent through the HEC parser") {
    import org.apache.spark.sql.functions._
    import graft.sinks.Formats
    val ev = Seq(
      (1704067200.5, "h1", 1L, "msg a"),
      (1704067201.25, "h2", 2L, "msg b")).toDF("t", "host", "id", "msg")
    val lines = ev.select(Formats.splunkHecEvent(
      timeSec = col("t"), host = col("host"), source = lit("app"),
      sourcetype = lit("graft:event"), index = lit("main"),
      fields = struct(lit("prod").as("env")),
      event = struct(col("id"), col("msg"))).as("value"))
    val got = loopback("hec_loop", 2) { port =>
      HttpSink.writeSplunkHec(lines.coalesce(1), s"http://127.0.0.1:$port",
        token = "tok", batchLines = 10)
    }
    // the body is newline-batched HEC maps; re-ingest through the same
    // parser the in_splunk side uses
    val parsed = graft.parse.Parsers.splunkHecEvents(
        got.toDF("body"), col("body"))
      .select(from_json(col("record"),
        org.apache.spark.sql.types.StructType.fromDDL(
          """time double, host string, source string, sourcetype string,
             index string, fields map<string,string>,
             event struct<id: bigint, msg: string>""")).as("r"))
      .select(col("r.time"), col("r.host"), col("r.source"),
        col("r.index"), element_at(col("r.fields"), "env"),
        col("r.event.id"), col("r.event.msg"))
      .as[(Double, String, String, String, String, Long, String)]
      .collect().toSet
    assert(parsed == Set(
      (1704067200.5, "h1", "app", "main", "prod", 1L, "msg a"),
      (1704067201.25, "h2", "app", "main", "prod", 2L, "msg b")))
  }
}
