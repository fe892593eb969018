package graft.sinks

import java.net.Socket

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.sources.Msgpack

/** out_forward sink (reference `plugins/out_forward`): ship rows as
  * Forward-mode msgpack frames to a fluentd/fluent-bit `in_forward`
  * endpoint (including this engine's own
  * [[graft.sources.ForwardServerSource]] — engine-to-engine relay).
  *
  * Distribution shape: each PARTITION opens its own connection and
  * streams its rows grouped by tag — no driver collect; at 1000
  * executors that is 1000 parallel forward clients, the same fan-in an
  * agent fleet presents. Batch form below; in streaming, call it from
  * `foreachBatch`.
  */
object ForwardSink {

  /** Write `df` to host:port. Expects columns: `tagCol` (string),
    * `tsSecCol` (long epoch seconds), and a `record` MAP<STRING,STRING>
    * column (the schemaless body) — the shape ForwardServerSource and
    * Tables.logEvents produce.
    */
  /** `sharedKey` enables the Forward security handshake (out_forward's
    * `security` section): HELO/PING/PONG with SHA-512 shared-key digests
    * before any event frame, mutual-auth verified — see
    * [[graft.sources.SecureForward]]. `username`/`password` add the
    * user-auth digest when the server requests it.
    */
  def write(df: DataFrame, host: String, port: Int,
            tagCol: String = "tag", tsSecCol: String = "ts_sec",
            recordCol: String = "record",
            sharedKey: Option[String] = None,
            selfHostname: String = "graft-sink",
            username: String = "", password: String = ""): Unit = {
    val prepared = df.select(
      col(tagCol).cast("string").as("tag"),
      col(tsSecCol).cast("long").as("sec"),
      col(recordCol).as("record"))
    prepared.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val sock = new Socket(host, port)
        try {
          val out = sock.getOutputStream
          sharedKey.foreach { key =>
            val ok = graft.sources.SecureForward.clientHandshake(
              sock.getInputStream, out, key, selfHostname, username, password)
            if (!ok) throw new java.io.IOException(
              "forward security handshake rejected")
          }
          // group consecutive rows by tag into one frame per run — the
          // protocol wants one [tag, entries] frame per tag batch
          val buffered = rows.buffered
          while (buffered.hasNext) {
            val tag = buffered.head.getAs[String]("tag")
            val events = scala.collection.mutable.ArrayBuffer[(Long, Long, Map[String, String])]()
            while (buffered.hasNext && buffered.head.getAs[String]("tag") == tag) {
              val r = buffered.next()
              events += ((r.getAs[Long]("sec"), 0L,
                r.getAs[Map[String, String]]("record")))
            }
            out.write(Msgpack.encodeForward(tag, events.toSeq))
          }
          out.flush()
        } finally sock.close()
      }
    }
  }
}
