package graft.sources

import java.io.{BufferedInputStream, InputStream, OutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** MQTT v3.1 *broker-side* push source — the analogue of the reference's
  * `plugins/in_mqtt` (`mqtt_prot.c`): IoT-ish clients CONNECT to us and
  * PUBLISH JSON payloads; each publish becomes one row.
  *
  * Protocol subset, mirroring `mqtt_prot_parser`
  * (mqtt_prot.c:370-486):
  *   - a connection's first packet MUST be CONNECT (else hangup), answered
  *     with CONNACK session-present=1, return code accepted
  *     (mqtt_handle_connect, :229-252);
  *   - PUBLISH: topic (2-byte BE length-prefixed), QoS 1 gets PUBACK and
  *     QoS 2 gets PUBREC echoing the packet id; DUP/RETAIN flags are
  *     ignored (mqtt_handle_publish, :257-345);
  *   - PINGREQ → PINGRESP (:348-368); DISCONNECT → hangup; other packet
  *     types are ignored;
  *   - the payload must be a complete JSON object — non-map payloads are
  *     dropped with a warning (mqtt_data_append → flb_pack_json,
  *     :125-145). The reference merges the JSON keys into the record
  *     beside `topic`; here the row carries the raw object for
  *     `from_json` downstream (schema-on-read instead of schemaless
  *     msgpack).
  *
  * The remaining-length varint (7 bits per byte, continuation MSB, max 4
  * bytes) follows mqtt_packet_header/:431-449; frames split across TCP
  * segments reassemble because reads block on the stream.
  *
  * Usage: `spark.readStream.format("graft.sources.MqttServerSource")
  * .option("port", p).load()` → rows (topic STRING, qos INT,
  * value STRING, ts TIMESTAMP).
  */
class MqttServerSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MqttServerSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val port = Option(properties.get("port")).map(_.toInt).getOrElse(
      throw new IllegalArgumentException("mqtt source requires option 'port'"))
    val host = Option(properties.get("host")).getOrElse("127.0.0.1")
    new MqttTable(host, port)
  }
}

object MqttServerSource {
  val Schema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("qos", IntegerType, nullable = false),
    StructField("value", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))

  /** Packet types (mqtt_prot.h:30-39). */
  val CONNECT = 1; val CONNACK = 2; val PUBLISH = 3; val PUBACK = 4
  val PUBREC = 5; val PINGREQ = 12; val PINGRESP = 13; val DISCONNECT = 14

  /** Quote/escape-aware scan: is `s` exactly one complete JSON object?
    * The cheap stand-in for the reference's full flb_pack_json parse —
    * enough to reject the non-map payloads mqtt_data_append drops.
    */
  def isJsonObject(s: String): Boolean = {
    var i = 0
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (i >= s.length || s.charAt(i) != '{') return false
    var depth = 0
    var inStr = false
    var esc = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' =>
          depth -= 1
          if (depth == 0) {
            var j = i + 1
            while (j < s.length && s.charAt(j).isWhitespace) j += 1
            return j == s.length
          }
        case _ =>
      }
      i += 1
    }
    false
  }
}

private[sources] class MqttTable(host: String, port: Int)
    extends Table with SupportsRead {
  override def name(): String = s"mqtt://$host:$port"
  override def schema(): StructType = MqttServerSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = MqttServerSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new MqttMicroBatchStream(host, port)
      }
    }
}

private[sources] class MqttMicroBatchStream(host: String, port: Int)
    extends MicroBatchStream {
  import MqttServerSource._

  // (topic, qos, payload, tsMillis)
  private val buf = new scala.collection.mutable.ArrayBuffer[(String, Int, String, Long)]
  @volatile private var stopped = false
  private val server = new ServerSocket()
  server.bind(new InetSocketAddress(host, port))

  private val acceptThread = new Thread(() => {
    while (!stopped) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), "graft-mqtt-conn")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: Throwable if stopped =>
        case e: Throwable => if (!stopped) e.printStackTrace()
      }
    }
  }, s"graft-mqtt-accept-$port")
  acceptThread.setDaemon(true)
  acceptThread.start()

  /** Remaining-length varint: 7 bits/byte, MSB continues, >4 bytes is a
    * protocol error (mqtt_prot.c:416 mult bound). Returns -1 on EOF/error.
    */
  private def readRemainingLength(in: InputStream): Int = {
    var mult = 1
    var length = 0
    var i = 0
    while (i < 4) {
      val b = in.read()
      if (b == -1) return -1
      length += (b & 127) * mult
      if ((b & 128) == 0) return length
      mult *= 128
      i += 1
    }
    -1
  }

  private def handle(sock: Socket): Unit = {
    val in = new BufferedInputStream(sock.getInputStream)
    val out = sock.getOutputStream
    var connected = false // first packet must be CONNECT (mqtt_prot.c:393)
    try {
      var done = false
      while (!done && !stopped) {
        val h = in.read()
        if (h == -1) done = true
        else {
          val ptype = (h >> 4) & 0x0f
          val flags = h & 0x0f
          val len = readRemainingLength(in)
          if (len < 0 || (!connected && ptype != CONNECT)) done = true
          else {
            val frame = in.readNBytes(len)
            if (frame.length < len) done = true
            else ptype match {
              case CONNECT =>
                connected = true
                // CONNACK: session-present bit set, return code accepted
                out.write(Array[Byte]((CONNACK << 4).toByte, 2, 1, 0))
                out.flush()
              case PUBLISH =>
                done = !publish(frame, flags, out)
              case PINGREQ =>
                out.write(Array[Byte]((PINGRESP << 4).toByte, 0))
                out.flush()
              case DISCONNECT =>
                done = true
              case _ => // ignored, like the reference's empty else
            }
          }
        }
      }
    } catch { case _: Throwable => /* peer went away */ }
    finally sock.close()
  }

  /** Parse one PUBLISH frame; returns false on a malformed frame (the
    * reference hangs up on -1 from mqtt_handle_publish).
    */
  private def publish(frame: Array[Byte], flags: Int, out: OutputStream): Boolean = {
    val qos = (flags >> 1) & 0x03
    if (frame.length < 2) return false
    val tlen = ((frame(0) & 0xff) << 8) | (frame(1) & 0xff)
    var pos = 2
    if (tlen > frame.length - pos) return false
    val topic = new String(frame, pos, tlen, StandardCharsets.UTF_8)
    pos += tlen
    if (qos > 0) {
      if (frame.length - pos < 2) return false
      val idHi = frame(pos); val idLo = frame(pos + 1)
      pos += 2
      val reply = if (qos == 1) PUBACK else PUBREC
      out.write(Array[Byte]((reply << 4).toByte, 2, idHi, idLo))
      out.flush()
    }
    val payload = new String(frame, pos, frame.length - pos, StandardCharsets.UTF_8)
    // non-map payloads are dropped, not fatal (mqtt_data_append :125-131)
    if (MqttServerSource.isJsonObject(payload)) {
      buf.synchronized { buf += ((topic, qos, payload, System.currentTimeMillis())) }
    }
    true
  }

  private var base = 0L

  override def initialOffset(): Offset = TcpOffset(0)
  override def latestOffset(): Offset =
    TcpOffset(buf.synchronized(base + buf.size))
  override def deserializeOffset(json: String): Offset = TcpOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TcpOffset].n
    val e = end.asInstanceOf[TcpOffset].n
    val rows = buf.synchronized {
      buf.slice((s - base).toInt.max(0), (e - base).toInt.max(0)).toArray
    }
    Array(MqttPartition(rows))
  }

  override def createReaderFactory(): PartitionReaderFactory = MqttReaderFactory

  override def commit(end: Offset): Unit = buf.synchronized {
    val drop = ((end.asInstanceOf[TcpOffset].n - base).toInt).min(buf.size).max(0)
    if (drop > 0) { buf.remove(0, drop); base += drop }
  }

  override def stop(): Unit = {
    stopped = true
    try server.close() catch { case _: Throwable => }
  }
}

private[sources] case class MqttPartition(rows: Array[(String, Int, String, Long)])
    extends InputPartition

private[sources] object MqttReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[MqttPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val (topic, qos, v, tsMs) = rows(i)
        InternalRow(UTF8String.fromString(topic), qos,
          UTF8String.fromString(v), tsMs * 1000L)
      }
      override def close(): Unit = {}
    }
  }
}
