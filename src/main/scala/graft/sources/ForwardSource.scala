package graft.sources

import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{MapType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** fluentd Forward-protocol push source — the analogue of the
  * reference's `plugins/in_forward`: an actual fluent-bit/fluentd agent
  * can point its `out_forward` at this port. Frames are msgpack arrays
  * (Message, Forward, and PackedForward modes — [[Msgpack.forwardEvents]]);
  * each event becomes a row (tag, ts, record MAP<STRING,STRING>) in the
  * two-tier schemaless model of SURVEY §1.4.
  *
  * Same micro-batch design as [[TcpServerSource]]. When the sender
  * requests acknowledgement (the `chunk` option), the server replies
  * `{"ack": id}` after buffering the events, so at-least-once senders
  * (Require_ack_response) do not retransmit; without the option the
  * edge contract is the usual at-most-once push.
  */
class ForwardServerSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ForwardServerSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val port = Option(properties.get("port")).map(_.toInt).getOrElse(
      throw new IllegalArgumentException("forward source requires option 'port'"))
    val host = Option(properties.get("host")).getOrElse("127.0.0.1")
    val sharedKey = Option(properties.get("shared_key"))
    val selfHostname = Option(properties.get("self_hostname")).getOrElse("graft")
    // fw_prot.c user auth: `users user1:pw1,user2:pw2` next to shared_key
    val users = Option(properties.get("users")).map(_.split(",").toSeq
      .map(_.trim).filter(_.nonEmpty).map { kv =>
        kv.split(":", 2) match {
          case Array(u, pw) => u -> pw
          case _ => throw new IllegalArgumentException(
            s"forward source option 'users': entry '$kv' is not user:password")
        }
      }.toMap).getOrElse(Map.empty[String, String])
    // `tls on` + keystore: the reference's in_forward `tls` block
    val tls = Tls.serverFromOptions(k => Option(properties.get(k)))
    new ForwardTable(host, port, sharedKey, selfHostname, users, tls)
  }
}

object ForwardServerSource {
  val Schema: StructType = StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("record", MapType(StringType, StringType), nullable = false)))
}

private[sources] class ForwardTable(host: String, port: Int,
                                    sharedKey: Option[String],
                                    selfHostname: String,
                                    users: Map[String, String],
                                    tls: Option[Tls.Server] = None)
    extends Table with SupportsRead {
  override def name(): String = s"forward://$host:$port"
  override def schema(): StructType = ForwardServerSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ForwardServerSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ForwardMicroBatchStream(host, port, sharedKey, selfHostname,
            users, tls)
      }
    }
}

private[sources] class ForwardMicroBatchStream(host: String, port: Int,
    sharedKey: Option[String] = None, selfHostname: String = "graft",
    users: Map[String, String] = Map.empty,
    tls: Option[Tls.Server] = None)
    extends MicroBatchStream {

  private val buf = new scala.collection.mutable.ArrayBuffer[Msgpack.Event]
  @volatile private var stopped = false
  // `tls on` terminates TLS at accept; a failed handshake drops only
  // that connection (the reference's tls layer behaves the same)
  private val server = tls.map(Tls.serverSocket).getOrElse(new ServerSocket())
  server.bind(new InetSocketAddress(host, port))

  private val acceptThread = new Thread(() => {
    while (!stopped) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), "graft-forward-conn")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: Throwable if stopped =>
        case e: Throwable => if (!stopped) e.printStackTrace()
      }
    }
  }, s"graft-forward-accept-$port")
  acceptThread.setDaemon(true)
  acceptThread.start()

  /** Incremental frame assembly: msgpack is self-delimiting, so decode
    * objects as bytes arrive. ONLY an [[Msgpack.Incomplete]] from the
    * outer `decode` means "wait for more bytes" — anything thrown while
    * interpreting a COMPLETE outer object (bad entry shape, truncated
    * PackedForward payload) is a malformed frame and closes the
    * connection; retrying it would stall the stream and grow `pending`
    * forever. When the sender requests an ack (`chunk` option), the
    * protocol's `{"ack": id}` reply is written back (at-least-once
    * senders with Require_ack_response retransmit without it).
    */
  private def handle(sock: Socket): Unit = {
    val in = sock.getInputStream
    val outStream = sock.getOutputStream
    // shared-key auth first when configured (fw_prot.c handshake);
    // an unauthenticated peer is notified via PONG(false) and dropped
    sharedKey.foreach { key =>
      val ok =
        try SecureForward.serverHandshake(in, outStream, key, selfHostname,
          users)
        catch { case _: Throwable => false }
      if (!ok) { sock.close(); return }
    }
    var pending = Array.emptyByteArray
    val chunk = new Array[Byte](64 * 1024)
    try {
      var n = in.read(chunk)
      while (n >= 0 && !stopped) {
        if (n > 0) {
          val merged = new Array[Byte](pending.length + n)
          System.arraycopy(pending, 0, merged, 0, pending.length)
          System.arraycopy(chunk, 0, merged, pending.length, n)
          var off = 0
          var more = true
          while (more) {
            val decoded =
              try Some(Msgpack.decode(merged, off))
              catch { case _: Msgpack.Incomplete => None }
            decoded match {
              case Some((v, next)) =>
                // errors from HERE on are malformed frames → propagate
                val events = Msgpack.forwardEvents(v)
                buf.synchronized { buf ++= events }
                Msgpack.forwardChunkId(v).foreach { id =>
                  outStream.write(Msgpack.encodeAck(id)); outStream.flush()
                }
                off = next
                if (off >= merged.length) more = false
              case None => more = false
            }
          }
          pending = java.util.Arrays.copyOfRange(merged, off, merged.length)
        }
        n = in.read(chunk)
      }
    } catch { case _: Throwable => /* peer went away / malformed frame */ }
    finally sock.close()
  }

  private var base = 0L

  override def initialOffset(): Offset = TcpOffset(0)
  override def latestOffset(): Offset =
    TcpOffset(buf.synchronized(base + buf.size))
  override def deserializeOffset(json: String): Offset = TcpOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TcpOffset].n
    val e = end.asInstanceOf[TcpOffset].n
    Array(ForwardPartition(buf.synchronized {
      buf.slice((s - base).toInt.max(0), (e - base).toInt.max(0)).toArray
    }))
  }

  override def createReaderFactory(): PartitionReaderFactory = ForwardReaderFactory

  override def commit(end: Offset): Unit = buf.synchronized {
    val drop = ((end.asInstanceOf[TcpOffset].n - base).toInt).min(buf.size).max(0)
    if (drop > 0) { buf.remove(0, drop); base += drop }
  }

  override def stop(): Unit = {
    stopped = true
    try server.close() catch { case _: Throwable => }
  }
}

private[sources] case class ForwardPartition(rows: Array[Msgpack.Event])
    extends InputPartition

private[sources] object ForwardReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[ForwardPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val e = rows(i)
        val keys = e.record.keys.toArray[Any].map(k => UTF8String.fromString(k.toString))
        val vals = e.record.values.toArray[Any].map(v => UTF8String.fromString(v.toString))
        InternalRow(
          UTF8String.fromString(e.tag),
          e.sec * 1000000L + e.nsec / 1000L,
          new ArrayBasedMapData(
            new GenericArrayData(keys.asInstanceOf[Array[Any]]),
            new GenericArrayData(vals.asInstanceOf[Array[Any]])))
      }
      override def close(): Unit = {}
    }
  }
}
