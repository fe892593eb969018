package graft.parse

import org.apache.spark.sql.{Column, DataFrame}

import scala.collection.mutable.ArrayBuffer

/** collectd network-protocol ingest — the reference's `in_collectd`
  * (`plugins/in_collectd/netprot.c`): a packet is a sequence of
  * `u16 type | u16 len | payload` parts (len includes the 4-byte
  * header). String parts (host 0x0000, plugin 0x0002,
  * plugin_instance 0x0003, type 0x0004, type_instance 0x0005) are
  * NUL-terminated and update a running header; TIME 0x0001 /
  * INTERVAL 0x0007 are u64 seconds, the `_HR` variants 0x0008/0x0009
  * carry 2^-30-second units; a VALUES part 0x0006 (u16 count, count
  * ds-type bytes, count 8-byte values) emits one metric with the
  * current header.
  *
  * Wire quirks faithfully kept from netprot.c:60-230: GAUGE values are
  * LITTLE-endian doubles (collectd sends x86 native order) while
  * COUNTER/DERIVE/ABSOLUTE are big-endian 64-bit ints; the field names
  * per `type` come from a TypesDB whose entry count MUST match the
  * value count or the metric is rejected.
  *
  * All reads are bounds-checked — this sits behind a listening UDP
  * socket, so a hostile length must never escape the datagram.
  */
object Collectd {

  // ds types (netprot.c:66-69)
  val Counter = 0
  val Gauge = 1
  val Derive = 2
  val Absolute = 3

  /** TypesDB entry: ordered (field name, ds type) pairs. */
  type TypesDb = Map[String, Seq[(String, Int)]]

  /** The handful of stock types the gated fixtures use; real
    * deployments pass their parsed types.db.
    */
  val DefaultTypes: TypesDb = Map(
    "gauge" -> Seq(("value", Gauge)),
    "load" -> Seq(("shortterm", Gauge), ("midterm", Gauge), ("longterm", Gauge)),
    "if_octets" -> Seq(("rx", Derive), ("tx", Derive)),
    "counter" -> Seq(("value", Counter)))

  /** One decoded sample: a VALUES part flattened to one row per field
    * (the long format the rest of the metrics pipeline speaks).
    */
  final case class Sample(host: String, plugin: String,
                          pluginInstance: String, typ: String,
                          typeInstance: String, timeSec: Double,
                          intervalSec: Double, field: String,
                          dsType: Int, value: Double)

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def u64be(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (b(i + k) & 0xffL); k += 1 }
    v
  }

  private def doubleLe(b: Array[Byte], i: Int): Double = {
    var bits = 0L
    var k = 7
    while (k >= 0) { bits = (bits << 8) | (b(i + k) & 0xffL); k -= 1 }
    java.lang.Double.longBitsToDouble(bits)
  }

  /** Decode one packet. Malformed parts throw (the reference logs and
    * drops the packet); unknown part types are skipped by length as the
    * protocol allows.
    */
  def decode(buf: Array[Byte],
             types: TypesDb = DefaultTypes): Seq[Sample] = {
    val out = ArrayBuffer.empty[Sample]
    var host = ""; var plugin = ""; var pluginInstance = ""
    var typ = ""; var typeInstance = ""
    var time = 0.0; var interval = 0.0
    var pos = 0
    while (pos + 4 <= buf.length) {
      val partType = u16(buf, pos)
      val partLen = u16(buf, pos + 2)
      if (partLen < 4 || pos + partLen > buf.length)
        throw new IllegalArgumentException(
          s"invalid collectd part length $partLen at $pos")
      val size = partLen - 4
      val off = pos + 4
      def str(): String = {
        // NUL-terminated string payload
        var end = off
        while (end < off + size && buf(end) != 0) end += 1
        new String(buf, off, end - off, "UTF-8")
      }
      partType match {
        case 0x0000 => host = str()
        case 0x0001 => time = u64be(buf, off).toDouble
        case 0x0002 => plugin = str()
        case 0x0003 => pluginInstance = str()
        case 0x0004 => typ = str()
        case 0x0005 => typeInstance = str()
        case 0x0006 =>
          if (size < 2) throw new IllegalArgumentException("short values part")
          val count = u16(buf, off)
          if (size != 2 + count * 9)
            throw new IllegalArgumentException(
              s"collectd values corrupted (size=$size, count=$count)")
          val fields = types.getOrElse(typ,
            throw new IllegalArgumentException(s"no such type '$typ'"))
          if (fields.length != count)
            throw new IllegalArgumentException(
              s"type '$typ' expects ${fields.length} values, got $count")
          var i = 0
          while (i < count) {
            val ds = buf(off + 2 + i).toInt
            val voff = off + 2 + count + 8 * i
            val v = ds match {
              case Gauge => doubleLe(buf, voff)
              case Counter | Absolute | Derive => u64be(buf, voff).toDouble
              case other => throw new IllegalArgumentException(
                s"unknown ds type $other")
            }
            out += Sample(host, plugin, pluginInstance, typ, typeInstance,
              time, interval, fields(i)._1, ds, v)
            i += 1
          }
        case 0x0007 => interval = u64be(buf, off).toDouble
        case 0x0008 => time = u64be(buf, off).toDouble / (1L << 30)
        case 0x0009 => interval = u64be(buf, off).toDouble / (1L << 30)
        case _ => () // unknown part: skip by length
      }
      pos += partLen
    }
    out.toSeq
  }

  // ---------------------------------------------------------------- encode
  /** One metric to encode: header fields + the typed values in TypesDB
    * order.
    */
  final case class Metric(host: String, plugin: String,
                          pluginInstance: String, typ: String,
                          typeInstance: String, timeSec: Long,
                          intervalSec: Long, values: Seq[Double])

  /** Serialize metrics into one packet (the client side of the
    * protocol — also what the gated round trip feeds back through
    * [[decode]]). String parts are re-emitted only when they change,
    * like collectd's own packet builder.
    */
  def encode(metrics: Seq[Metric],
             types: TypesDb = DefaultTypes): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(256)
    def part(t: Int, payload: Array[Byte]): Unit = {
      val len = payload.length + 4
      out.write((t >> 8) & 0xff); out.write(t & 0xff)
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(payload)
    }
    def strPart(t: Int, s: String): Unit =
      part(t, s.getBytes("UTF-8") :+ 0.toByte)
    def u64Part(t: Int, v: Long): Unit = {
      val b = new Array[Byte](8)
      var k = 0
      while (k < 8) { b(k) = ((v >>> (8 * (7 - k))) & 0xff).toByte; k += 1 }
      part(t, b)
    }
    var lastHost = ""; var lastPlugin = ""; var lastPi = ""
    var lastType = ""; var lastTi = ""
    metrics.foreach { m =>
      if (m.host != lastHost) { strPart(0x0000, m.host); lastHost = m.host }
      u64Part(0x0001, m.timeSec)
      if (m.plugin != lastPlugin) { strPart(0x0002, m.plugin); lastPlugin = m.plugin }
      if (m.pluginInstance != lastPi) { strPart(0x0003, m.pluginInstance); lastPi = m.pluginInstance }
      if (m.typ != lastType) { strPart(0x0004, m.typ); lastType = m.typ }
      if (m.typeInstance != lastTi) { strPart(0x0005, m.typeInstance); lastTi = m.typeInstance }
      if (m.intervalSec > 0) u64Part(0x0007, m.intervalSec)
      val fields = types(m.typ)
      require(fields.length == m.values.length,
        s"type '${m.typ}' expects ${fields.length} values")
      val count = m.values.length
      val payload = new Array[Byte](2 + count * 9)
      payload(0) = ((count >> 8) & 0xff).toByte
      payload(1) = (count & 0xff).toByte
      var i = 0
      while (i < count) {
        val ds = fields(i)._2
        payload(2 + i) = ds.toByte
        val voff = 2 + count + 8 * i
        if (ds == Gauge) {
          val bits = java.lang.Double.doubleToLongBits(m.values(i))
          var k = 0
          while (k < 8) { payload(voff + k) = ((bits >>> (8 * k)) & 0xff).toByte; k += 1 }
        } else {
          val v = m.values(i).toLong
          var k = 0
          while (k < 8) { payload(voff + k) = ((v >>> (8 * (7 - k))) & 0xff).toByte; k += 1 }
        }
        i += 1
      }
      part(0x0006, payload)
    }
    out.toByteArray
  }

  // ---------------------------------------------------------- spark-facing
  /** One row per decoded sample field; malformed packets drop (the
    * reference logs and skips — a hostile datagram must not poison the
    * batch).
    */
  def decodeBodies(df: DataFrame, body: Column,
                   types: TypesDb = DefaultTypes): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(body.cast("binary"))
      .as[Array[Byte]]
      .flatMap(b => scala.util.Try(decode(b, types)).getOrElse(Seq.empty))
      .toDF()
  }
}
