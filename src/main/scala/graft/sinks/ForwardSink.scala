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

  /** One upstream node of an HA target list — the classic `upstream`
    * file / YAML `upstream_servers` section (`src/flb_upstream_ha.c`,
    * out_forward's `forward_config_ha`,
    * `plugins/out_forward/forward.c:1090`). Security credentials are
    * per-node, like the reference's node properties
    * (`flb_upstream_node_get_property`).
    */
  final case class Node(host: String, port: Int,
                        sharedKey: Option[String] = None,
                        username: String = "", password: String = "")

  /** Write `df` to host:port. Expects columns: `tagCol` (string),
    * `tsSecCol` (long epoch seconds), and a `record` MAP<STRING,STRING>
    * column (the schemaless body) — the shape ForwardServerSource and
    * Tables.logEvents produce.
    *
    * `sharedKey` enables the Forward security handshake (out_forward's
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
            username: String = "", password: String = ""): Unit =
    writeHa(df, Seq(Node(host, port, sharedKey, username, password)),
      tagCol, tsSecCol, recordCol, selfHostname)

  /** HA write — out_forward's `upstream` mode. The reference rotates
    * `last_used_node` once per flush (`flb_upstream_ha_node_get`,
    * `src/flb_upstream_ha.c:87-110`) and a failed connect makes the
    * flush FLB_RETRY, so the retried chunk draws the NEXT node —
    * round-robin spread plus failover-on-connect-error. The Spark
    * flush unit is the partition: each partition starts at
    * `partitionId % nodes.size` (the rotation analog for a parallel
    * engine — uniform spread without cross-task coordination) and
    * fails over to each subsequent node at most once; only with every
    * node down does the task error (Spark's task retry is then the
    * outer retry loop, exactly the reference's scheduler retry).
    * Delivery is per-chunk at-least-once on failover, matching the
    * reference (a chunk that died mid-write replays wholly on the
    * next node).
    */
  def writeHa(df: DataFrame, nodes: Seq[Node],
              tagCol: String = "tag", tsSecCol: String = "ts_sec",
              recordCol: String = "record",
              selfHostname: String = "graft-sink"): Unit = {
    require(nodes.nonEmpty, "upstream node list is empty")
    val prepared = df.select(
      col(tagCol).cast("string").as("tag"),
      col(tsSecCol).cast("long").as("sec"),
      col(recordCol).as("record"))
    val nodeList = nodes.toIndexedSeq
    prepared.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        // materialize the chunk: failover re-sends the WHOLE chunk to
        // the next node (the reference retries the full flush buffer)
        val chunk = rows.toVector
        val start = math.abs(
          Option(org.apache.spark.TaskContext.get())
            .map(_.partitionId).getOrElse(0)) % nodeList.size
        var sent = false
        var lastErr: Throwable = null
        var k = 0
        while (!sent && k < nodeList.size) {
          val node = nodeList((start + k) % nodeList.size)
          try {
            sendChunk(chunk, node, selfHostname)
            sent = true
          } catch {
            case e: java.io.IOException => lastErr = e
          }
          k += 1
        }
        if (!sent) throw new java.io.IOException(
          s"all ${nodeList.size} upstream nodes failed", lastErr)
      }
    }
  }

  /** One chunk to one node: connect, optional security handshake, one
    * [tag, entries] frame per consecutive tag run.
    */
  private def sendChunk(chunk: Seq[Row], node: Node,
                        selfHostname: String): Unit = {
    val sock = new Socket(node.host, node.port)
    try {
      val out = sock.getOutputStream
      node.sharedKey.foreach { key =>
        val ok = graft.sources.SecureForward.clientHandshake(
          sock.getInputStream, out, key, selfHostname,
          node.username, node.password)
        if (!ok) throw new java.io.IOException(
          "forward security handshake rejected")
      }
      val buffered = chunk.iterator.buffered
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
