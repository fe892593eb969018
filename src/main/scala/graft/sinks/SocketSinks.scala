package graft.sinks

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Raw socket delivery — the reference's `out_tcp` (newline-framed
  * lines over a persistent connection) and `out_udp` (one datagram per
  * record). `out_syslog` in tcp/udp mode is exactly these transports
  * with [[Formats.syslog5424Line]] composed upstream.
  *
  * Distribution shape (same as [[ForwardSink]]/[[HttpSink]]): each
  * PARTITION owns its client socket — no driver funnel; at 1000
  * executors that is 1000 concurrent writers, matching the reference's
  * worker model.
  */
object SocketSinks {

  /** out_tcp: newline-framed lines, one persistent connection per
    * partition. `tls` wraps the client socket (the plugin's `tls on`).
    */
  def writeTcp(df: DataFrame, host: String, port: Int,
               lineCol: String = "value",
               tls: Option[graft.sources.Tls.Client] = None): Unit = {
    val lines = df.select(col(lineCol).cast("string").as("line"))
      .filter(col("line").isNotNull)
    lines.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val sock = tls match {
          case Some(t) => graft.sources.Tls.clientSocket(t, host, port)
          case None => new java.net.Socket(host, port)
        }
        try {
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          rows.foreach { r =>
            out.write((r.getAs[String]("line") + "\n")
              .getBytes(StandardCharsets.UTF_8))
          }
          out.flush()
        } finally sock.close()
      }
    }
  }

  /** out_udp: one datagram per record line (the reference sends each
    * formatted event as its own packet; no framing, no delivery
    * guarantee — fire-and-forget like the plugin).
    */
  def writeUdp(df: DataFrame, host: String, port: Int,
               lineCol: String = "value"): Unit = {
    val lines = df.select(col(lineCol).cast("string").as("line"))
      .filter(col("line").isNotNull)
    lines.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val sock = new java.net.DatagramSocket()
        try {
          val addr = java.net.InetAddress.getByName(host)
          rows.foreach { r =>
            val b = r.getAs[String]("line").getBytes(StandardCharsets.UTF_8)
            sock.send(new java.net.DatagramPacket(b, b.length, addr, port))
          }
        } finally sock.close()
      }
    }
  }
}
