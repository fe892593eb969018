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
}
