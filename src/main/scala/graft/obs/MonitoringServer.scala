package graft.obs

import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession

/** The engine's HTTP monitoring endpoint — the analog of the
  * reference's built-in http_server (`/root/reference/src/http_server/`,
  * enabled by `http_server on`): a tiny driver-side server exposing the
  * engine's own telemetry. Endpoints mirror the reference's api/v1
  * registrations:
  *
  *   - `/api/v1/metrics/prometheus` — the [[SelfTelemetry.Listener]]
  *     register set rendered by [[SelfTelemetry.promExposition]]
  *     (`api/v1/metrics.c:430`, cmt_encode_prometheus over the agent's
  *     cmetrics contexts);
  *   - `/api/v1/uptime` — `{"uptime_sec":N,"uptime_hr":"..."}`
  *     (`api/v1/uptime.c`);
  *   - `/api/v1/health` — `ok` / HTTP 200 (`api/v1/health.c`'s
  *     healthy path).
  *
  * Driver-side BY DESIGN: the served payload is the listener's bounded
  * register set (series count = queries × sources × stages), never data
  * rows — the same scale class as the reference's monitoring thread.
  * Single accept thread, one request per connection, daemon so it never
  * pins the JVM.
  */
final class MonitoringServer(spark: SparkSession,
                             listener: SelfTelemetry.Listener,
                             bindPort: Int = 0) extends AutoCloseable {

  private val startedAtMs = System.currentTimeMillis
  private val server = new ServerSocket()
  server.setReuseAddress(true)
  server.bind(new InetSocketAddress("127.0.0.1", bindPort))
  @volatile private var running = true

  /** The bound port (bindPort=0 picks a free one). */
  def port: Int = server.getLocalPort

  private val thread = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        try handle(sock)
        finally sock.close()
      } catch {
        case _: java.net.SocketException => () // close() unblocks accept
        case _: Exception if running     => ()
      }
    }
  }, "graft-monitoring-http")
  thread.setDaemon(true)
  thread.start()

  private def handle(sock: Socket): Unit = {
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(sock.getInputStream, UTF_8))
    val reqLine = in.readLine()
    if (reqLine == null) return
    // drain headers (requests are header-only GETs)
    var l = in.readLine()
    while (l != null && l.nonEmpty) l = in.readLine()
    val parts = reqLine.split(" ")
    val path = if (parts.length >= 2) parts(1) else "/"
    val (status, ctype, body) =
      if (!parts.headOption.contains("GET"))
        ("405 Method Not Allowed", "text/plain", "method not allowed\n")
      else path.takeWhile(_ != '?') match {
        case "/api/v1/metrics/prometheus" =>
          val lines = SelfTelemetry.promExposition(listener.snapshot(spark))
            .collect().map(_.getString(0))
          ("200 OK", "text/plain; version=0.0.4",
            lines.mkString("", "\n", "\n"))
        case "/api/v1/uptime" =>
          val s = (System.currentTimeMillis - startedAtMs) / 1000
          ("200 OK", "application/json",
            s"""{"uptime_sec":$s,"uptime_hr":"Fluent Bit has been running: $s seconds"}""")
        case "/api/v1/health" =>
          ("200 OK", "text/plain", "ok\n")
        case _ =>
          ("404 Not Found", "text/plain", "not found\n")
      }
    val bytes = body.getBytes(UTF_8)
    val out = sock.getOutputStream
    out.write((s"HTTP/1.1 $status\r\nContent-Type: $ctype\r\n" +
      s"Content-Length: ${bytes.length}\r\nConnection: close\r\n\r\n")
      .getBytes(UTF_8))
    out.write(bytes)
    out.flush()
  }

  override def close(): Unit = {
    running = false
    server.close()
  }
}
