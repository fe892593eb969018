package graft.sinks

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** NATS publisher — the reference's `out_nats` (`plugins/out_nats/
  * nats.c:160-230`): on connect the server sends `INFO {...}`, the
  * client answers the fixed `CONNECT {...}` line (nats.h:26), then each
  * chunk publishes as `PUB <subject> <#bytes>\r\n<payload>\r\n` with
  * subject = tag and payload = the JSON array `[[ts, record], …]`
  * (msgpack_to_json, nats.c:81-150).
  *
  * Same per-partition client model as the other push sinks.
  */
object NatsSink {

  val ConnectLine: String =
    "CONNECT {\"verbose\":false,\"pedantic\":false,\"ssl_required\":false," +
      "\"name\":\"graft\",\"lang\":\"scala\",\"version\":\"1\"}\r\n"

  /** One `PUB` frame: header, payload, trailing CRLF (nats.c:205-213). */
  def pubFrame(subject: String, payload: Array[Byte]): Array[Byte] = {
    val header = s"PUB $subject ${payload.length}\r\n"
      .getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](header.length + payload.length + 2)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(payload, 0, out, header.length, payload.length)
    out(out.length - 2) = '\r'
    out(out.length - 1) = '\n'
    out
  }

  /** The reference's publish payload: `[[ts_sec, record], …]` — build it
    * upstream with `collect_list` per tag and pass one row per PUB.
    */
  def natsPayload(tsSec: Column, record: Column): Column =
    to_json(array(array(tsSec.cast("string"), record)))

  /** Publish (subject, payload) rows, one persistent connection per
    * partition: read the server's INFO line, send CONNECT, then one PUB
    * frame per row (fire-and-forget like the reference's non-verbose
    * mode).
    */
  def write(df: DataFrame, host: String, port: Int,
            subjectCol: String = "subject",
            payloadCol: String = "payload"): Unit = {
    val rows = df.select(col(subjectCol).cast("string").as("subject"),
        col(payloadCol).cast("string").as("payload"))
      .filter(col("subject").isNotNull && col("payload").isNotNull)
    rows.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val sock = new java.net.Socket(host, port)
        try {
          val in = new java.io.BufferedInputStream(sock.getInputStream)
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          // INFO {...}\r\n greeting precedes anything else
          var b = in.read()
          while (b >= 0 && b != '\n') b = in.read()
          out.write(ConnectLine.getBytes(StandardCharsets.UTF_8))
          it.foreach { r =>
            out.write(pubFrame(r.getAs[String]("subject"),
              r.getAs[String]("payload").getBytes(StandardCharsets.UTF_8)))
          }
          out.flush()
        } finally sock.close()
      }
    }
  }
}
