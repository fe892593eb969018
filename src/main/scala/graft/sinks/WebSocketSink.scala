package graft.sinks

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** WebSocket push sink — the reference's `out_websocket`
  * (`plugins/out_websocket/websocket.c`): an RFC 6455 client that
  * upgrades the connection once and then sends each formatted record as
  * its own masked TEXT frame. Same per-partition client model as the
  * other push sinks.
  */
object WebSocketSink {

  private val AcceptGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  /** Expected `Sec-WebSocket-Accept` for a key: base64(SHA1(key+GUID))
    * (RFC 6455 §4.2.2) — used both to verify the server's 101 response
    * and by test servers.
    */
  def acceptFor(key: String): String = {
    val sha1 = java.security.MessageDigest.getInstance("SHA-1")
    java.util.Base64.getEncoder.encodeToString(
      sha1.digest((key + AcceptGuid).getBytes(StandardCharsets.UTF_8)))
  }

  /** One masked client TEXT frame (FIN=1, opcode=1, MASK=1, 7/16/64-bit
    * length tiers) — clients MUST mask (RFC 6455 §5.3); an unmasked
    * client frame is a protocol error servers drop.
    */
  def textFrame(payload: Array[Byte], rnd: java.util.Random): Array[Byte] = {
    val mask = new Array[Byte](4)
    rnd.nextBytes(mask)
    val n = payload.length
    val header =
      if (n < 126) Array[Byte](0x81.toByte, (0x80 | n).toByte)
      else if (n < 65536) Array[Byte](0x81.toByte, 0xfe.toByte,
        ((n >> 8) & 0xff).toByte, (n & 0xff).toByte)
      else {
        val h = new Array[Byte](10)
        h(0) = 0x81.toByte; h(1) = 0xff.toByte
        var i = 0
        while (i < 8) { h(2 + i) = ((n.toLong >>> (8 * (7 - i))) & 0xff).toByte; i += 1 }
        h
      }
    val out = new Array[Byte](header.length + 4 + n)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(mask, 0, out, header.length, 4)
    var i = 0
    while (i < n) {
      out(header.length + 4 + i) = (payload(i) ^ mask(i % 4)).toByte
      i += 1
    }
    out
  }

  /** Upgrade the socket to a websocket (RFC 6455 §4): send the GET with
    * a random Sec-WebSocket-Key, require a 101 whose Accept echoes the
    * key hash — a mismatched Accept means a broken/spoofed endpoint and
    * fails the task rather than silently streaming into it.
    */
  def handshake(sock: java.net.Socket, host: String, path: String,
                rnd: java.util.Random): Unit = {
    val keyBytes = new Array[Byte](16)
    rnd.nextBytes(keyBytes)
    val key = java.util.Base64.getEncoder.encodeToString(keyBytes)
    val req = s"GET $path HTTP/1.1\r\nHost: $host\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Key: $key\r\nSec-WebSocket-Version: 13\r\n\r\n"
    sock.getOutputStream.write(req.getBytes(StandardCharsets.UTF_8))
    sock.getOutputStream.flush()
    val in = new java.io.BufferedInputStream(sock.getInputStream)
    def line(): String = {
      val sb = new java.lang.StringBuilder
      var b = in.read()
      while (b >= 0 && b != '\n') { if (b != '\r') sb.append(b.toChar); b = in.read() }
      sb.toString
    }
    val status = line()
    if (!status.contains("101"))
      throw new java.io.IOException(s"websocket upgrade refused: $status")
    var accept: String = null
    var h = line()
    while (h.nonEmpty) {
      val i = h.indexOf(':')
      if (i > 0 && h.substring(0, i).equalsIgnoreCase("sec-websocket-accept"))
        accept = h.substring(i + 1).trim
      h = line()
    }
    if (accept != acceptFor(key))
      throw new java.io.IOException("websocket accept-key mismatch")
  }

  /** Send each line as one masked TEXT frame over a per-partition
    * upgraded connection.
    */
  def write(df: DataFrame, host: String, port: Int, path: String = "/",
            lineCol: String = "value"): Unit = {
    val lines = df.select(col(lineCol).cast("string").as("line"))
      .filter(col("line").isNotNull)
    lines.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val rnd = new java.util.Random()
        val sock = new java.net.Socket(host, port)
        try {
          handshake(sock, host, path, rnd)
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          rows.foreach { r =>
            out.write(textFrame(
              r.getAs[String]("line").getBytes(StandardCharsets.UTF_8), rnd))
          }
          out.flush()
        } finally sock.close()
      }
    }
  }
}
