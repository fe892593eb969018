package graft.sources

/** Minimal msgpack decoder — just the subset the fluentd Forward
  * protocol puts on the wire (reference `plugins/in_forward`; spec:
  * github.com/msgpack/msgpack, fluent forward protocol v1): nil, bool,
  * all int widths, float32/64, str/bin, array, map, and the EventTime
  * ext type (fixext8/ext8 type 0 = 4-byte seconds + 4-byte nanos).
  * Hand-rolled because the sandbox ships no msgpack library; ~the same
  * scope as the reference's own decoder usage.
  */
object Msgpack {

  sealed trait V
  case object MNil extends V
  final case class MBool(b: Boolean) extends V
  final case class MInt(v: Long) extends V
  final case class MFloat(v: Double) extends V
  /** `raw` (set only by the decoder; excluded from equality/matching)
    * preserves the wire bytes when they may not be valid UTF-8: the C
    * reference packs raw random nonce/salt bytes as msgpack str
    * (fw_prot.c:205-208,287-293), and a lossy String re-encode would
    * feed corrupted bytes into the handshake digests. `bytes` returns
    * the original wire slice when present.
    */
  final case class MStr(s: String) extends V {
    private[sources] var raw: Array[Byte] = null
    def bytes: Array[Byte] =
      if (raw != null) raw else s.getBytes("UTF-8")
  }
  final case class MBin(b: Array[Byte]) extends V
  final case class MArr(items: Vector[V]) extends V
  final case class MMap(entries: Vector[(V, V)]) extends V
  final case class MExt(typ: Byte, data: Array[Byte]) extends V

  /** Raised when the buffer ends mid-object — the streaming reader
    * waits for more bytes and retries.
    */
  final class Incomplete extends Exception

  private def need(b: Array[Byte], off: Int, n: Int): Unit =
    if (off + n > b.length) throw new Incomplete

  /** Reject negative / overflowed 32-bit lengths as PROTOCOL errors —
    * a silently-empty container would desync the rest of the stream.
    */
  private def len(n: Int): Int =
    if (n < 0) throw new IllegalArgumentException(s"negative msgpack length $n")
    else n

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def u16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def u32(b: Array[Byte], i: Int): Long =
    (u16(b, i).toLong << 16) | u16(b, i + 2)
  private def i64(b: Array[Byte], i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)

  private def str(b: Array[Byte], off: Int, n: Int): (V, Int) = {
    need(b, off, n)
    val v = MStr(new String(b, off, n, "UTF-8"))
    v.raw = java.util.Arrays.copyOfRange(b, off, off + n)
    (v, off + n)
  }
  private def bin(b: Array[Byte], off: Int, n: Int): (V, Int) = {
    need(b, off, n)
    (MBin(java.util.Arrays.copyOfRange(b, off, off + n)), off + n)
  }
  private def arr(b: Array[Byte], off: Int, n: Int): (V, Int) = {
    var o = off
    val items = Vector.newBuilder[V]
    var i = 0
    while (i < n) { val (v, o2) = decode(b, o); items += v; o = o2; i += 1 }
    (MArr(items.result()), o)
  }
  private def mp(b: Array[Byte], off: Int, n: Int): (V, Int) = {
    var o = off
    val entries = Vector.newBuilder[(V, V)]
    var i = 0
    while (i < n) {
      val (k, o2) = decode(b, o); val (v, o3) = decode(b, o2)
      entries += ((k, v)); o = o3; i += 1
    }
    (MMap(entries.result()), o)
  }
  private def ext(b: Array[Byte], off: Int, n: Int): (V, Int) = {
    need(b, off, 1 + n)
    (MExt(b(off), java.util.Arrays.copyOfRange(b, off + 1, off + 1 + n)), off + 1 + n)
  }

  /** Decode one object at `off`; returns (value, next offset). Throws
    * [[Incomplete]] when the buffer ends inside the object.
    */
  def decode(b: Array[Byte], off: Int): (V, Int) = {
    need(b, off, 1)
    val t = u8(b, off)
    val o = off + 1
    t match {
      case x if x <= 0x7f => (MInt(x.toLong), o)
      case x if x >= 0xe0 => (MInt(x.toByte.toLong), o)
      case x if (x & 0xf0) == 0x80 => mp(b, o, x & 0x0f)
      case x if (x & 0xf0) == 0x90 => arr(b, o, x & 0x0f)
      case x if (x & 0xe0) == 0xa0 => str(b, o, x & 0x1f)
      case 0xc0 => (MNil, o)
      case 0xc2 => (MBool(false), o)
      case 0xc3 => (MBool(true), o)
      case 0xc4 => need(b, o, 1); bin(b, o + 1, u8(b, o))
      case 0xc5 => need(b, o, 2); bin(b, o + 2, u16(b, o))
      case 0xc6 => need(b, o, 4); bin(b, o + 4, len(u32(b, o).toInt))
      case 0xc7 => need(b, o, 1); ext(b, o + 1, u8(b, o))
      case 0xc8 => need(b, o, 2); ext(b, o + 2, u16(b, o))
      case 0xc9 => need(b, o, 4); ext(b, o + 4, len(u32(b, o).toInt))
      case 0xca => need(b, o, 4)
        (MFloat(java.lang.Float.intBitsToFloat(u32(b, o).toInt).toDouble), o + 4)
      case 0xcb => need(b, o, 8)
        (MFloat(java.lang.Double.longBitsToDouble(i64(b, o))), o + 8)
      case 0xcc => need(b, o, 1); (MInt(u8(b, o).toLong), o + 1)
      case 0xcd => need(b, o, 2); (MInt(u16(b, o).toLong), o + 2)
      case 0xce => need(b, o, 4); (MInt(u32(b, o)), o + 4)
      case 0xcf => need(b, o, 8); (MInt(i64(b, o)), o + 8) // uint64 as signed
      case 0xd0 => need(b, o, 1); (MInt(b(o).toLong), o + 1)
      case 0xd1 => need(b, o, 2); (MInt(u16(b, o).toShort.toLong), o + 2)
      case 0xd2 => need(b, o, 4); (MInt(u32(b, o).toInt.toLong), o + 4)
      case 0xd3 => need(b, o, 8); (MInt(i64(b, o)), o + 8)
      case 0xd4 => ext(b, o, 1)
      case 0xd5 => ext(b, o, 2)
      case 0xd6 => ext(b, o, 4)
      case 0xd7 => ext(b, o, 8)
      case 0xd8 => ext(b, o, 16)
      case 0xd9 => need(b, o, 1); str(b, o + 1, u8(b, o))
      case 0xda => need(b, o, 2); str(b, o + 2, u16(b, o))
      case 0xdb => need(b, o, 4); str(b, o + 4, len(u32(b, o).toInt))
      case 0xdc => need(b, o, 2); arr(b, o + 2, u16(b, o))
      case 0xdd => need(b, o, 4); arr(b, o + 4, len(u32(b, o).toInt))
      case 0xde => need(b, o, 2); mp(b, o + 2, u16(b, o))
      case 0xdf => need(b, o, 4); mp(b, o + 4, len(u32(b, o).toInt))
      case other => throw new IllegalArgumentException(
        f"unsupported msgpack type 0x$other%02x at $off")
    }
  }

  /** Render a value as the string form used for the schemaless body map
    * (nested structures render as compact JSON).
    */
  def render(v: V): String = v match {
    case MNil => "null"
    case MBool(x) => x.toString
    case MInt(x) => x.toString
    case MFloat(x) => if (x == x.floor && !x.isInfinite) x.toLong.toString else x.toString
    case MStr(s) => s
    case MBin(b) => java.util.Base64.getEncoder.encodeToString(b)
    case MArr(items) => items.map(renderJson).mkString("[", ",", "]")
    case MMap(es) => es.map { case (k, vv) =>
      renderJson(MStr(render(k))) + ":" + renderJson(vv) }.mkString("{", ",", "}")
    case MExt(t, d) => s"ext($t,${d.length})"
  }
  private def renderJson(v: V): String = v match {
    case MStr(s) => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case other => render(other)
  }

  /** Event time of a Forward `time` element: plain integer epoch seconds
    * or the EventTime ext (type 0: 4-byte sec, 4-byte nanos).
    */
  def eventTime(v: V): (Long, Long) = v match {
    case MInt(sec) => (sec, 0L)
    case MFloat(sec) => (sec.toLong, ((sec - sec.toLong) * 1e9).toLong)
    case MExt(0, d) if d.length == 8 =>
      ((u32(d, 0)), (u32(d, 4)))
    case other => throw new IllegalArgumentException(s"bad event time $other")
  }

  /** One decoded Forward event. */
  final case class Event(tag: String, sec: Long, nsec: Long,
                         record: Map[String, String])

  /** Decompressed-payload cap for compressed PackedForward chunks — the
    * reference's buffer_max_size guard (in_forward/fw_prot.c:1707): a
    * gzip bomb fails loudly instead of exhausting the receiver.
    */
  val MaxPackedBytes: Int = 32 * 1024 * 1024

  private def sniffGzip(d: Array[Byte]): Boolean =
    d.length >= 2 && d(0) == 0x1f.toByte && d(1) == 0x8b.toByte

  /** Bounded gunzip. GZIPInputStream handles the concatenated-member
    * streams fluentd emits when it appends compressed chunks.
    */
  def gunzip(data: Array[Byte], limit: Int = MaxPackedBytes): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(data))
    val out = new java.io.ByteArrayOutputStream(
      math.min(math.max(data.length * 4, 4096), 1 << 16))
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      if (out.size > limit) throw new IllegalArgumentException(
        s"packedforward payload too large (> $limit bytes after gunzip)")
      n = in.read(buf)
    }
    out.toByteArray
  }

  /** The `compressed` algorithm declared in a chunk's option map
    * (in_forward/fw_prot.c:107): "gzip" / "zstd" / absent.
    */
  private def declaredCompression(rest: Seq[V]): Option[String] =
    rest.collectFirst { case MMap(es) =>
      es.collectFirst { case (MStr("compressed"), MStr(alg)) => alg }
    }.flatten

  /** Parse one top-level Forward entry (fluent forward protocol v1):
    * `[tag, time, record]` (Message mode), `[tag, [[time, record]...]]`
    * (Forward mode), or `[tag, bin]` (PackedForward — the bin payload is
    * a stream of [time, record] entries, gzip-compressed when the option
    * map carries `compressed: "gzip"`). Magic bytes win over the declared
    * option when both are present and disagree (fw_prot.c:1729-1739);
    * other option-map keys are ignored here (ack is handled by the
    * socket layer).
    */
  def forwardEvents(v: V): Seq[Event] = v match {
    case MArr(MStr(tag) +: rest) => rest match {
      case (entries: MArr) +: _ =>
        entries.items.map {
          case MArr(Vector(t, rec)) => event(tag, t, rec)
          case other => throw new IllegalArgumentException(s"bad entry $other")
        }
      case MBin(packed0) +: _ =>
        val declared = declaredCompression(rest.drop(1))
        // Magic bytes win over the declared option in BOTH directions
        // (fw_prot.c:1729-1739): a gzip-magic payload is gunzipped even
        // when undeclared, and a declared "gzip"/"zstd" whose payload
        // carries no matching magic is passed through raw — never handed
        // to the codec to die with a raw ZipException.
        val packed =
          if (sniffGzip(packed0)) gunzip(packed0)
          else if (Zstd.sniff(packed0))
            Zstd.decompress(packed0, MaxPackedBytes)
          else packed0
        var o = 0
        val out = Seq.newBuilder[Event]
        while (o < packed.length) {
          val (e, o2) = decode(packed, o)
          e match {
            case MArr(Vector(t, rec)) => out += event(tag, t, rec)
            case other => throw new IllegalArgumentException(s"bad packed $other")
          }
          o = o2
        }
        out.result()
      case t +: rec +: _ => Seq(event(tag, t, rec))
      case other => throw new IllegalArgumentException(s"bad forward array $other")
    }
    case other => throw new IllegalArgumentException(s"bad forward message $other")
  }

  private def event(tag: String, t: V, rec: V): Event = {
    val (sec, nsec) = eventTime(t)
    val m = rec match {
      case MMap(es) => es.map { case (k, v) => render(k) -> render(v) }.toMap
      case other => Map("message" -> render(other))
    }
    Event(tag, sec, nsec, m)
  }

  // -------------------------------------------------------------- encoder

  /** Encode the Forward-mode frame `[tag, [[EventTime, record]...]]` —
    * the out_forward side (reference `plugins/out_forward`): what this
    * engine writes, a fluentd/fluent-bit in_forward can ingest. Every
    * length tier up to 32 bits is handled (a missing str32 tier would
    * emit a corrupt header for a ≥64 KiB log line and desync the
    * receiver).
    */
  def encodeForward(tag: String, events: Seq[(Long, Long, Map[String, String])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def wU16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    def wU32(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    def wArrHeader(n: Int): Unit =
      if (n < 16) out.write(0x90 | n)
      else if (n < 65536) { out.write(0xdc); wU16(n) }
      else { out.write(0xdd); wU32(n.toLong) }
    def wMapHeader(n: Int): Unit =
      if (n < 16) out.write(0x80 | n)
      else if (n < 65536) { out.write(0xde); wU16(n) }
      else { out.write(0xdf); wU32(n.toLong) }
    def wStr(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      if (b.length < 32) out.write(0xa0 | b.length)
      else if (b.length < 256) { out.write(0xd9); out.write(b.length) }
      else if (b.length < 65536) { out.write(0xda); wU16(b.length) }
      else { out.write(0xdb); wU32(b.length.toLong) }
      out.write(b)
    }
    wArrHeader(2)
    wStr(tag)
    wArrHeader(events.size)
    events.foreach { case (sec, nsec, record) =>
      wArrHeader(2)
      out.write(0xd7); out.write(0x00); wU32(sec); wU32(nsec) // EventTime ext
      wMapHeader(record.size)
      record.foreach { case (k, v) => wStr(k); wStr(v) }
    }
    out.toByteArray
  }

  /** Generic single-object encoder (inverse of [[decode]]) — used by the
    * secure-Forward handshake frames; record batches keep the
    * specialized [[encodeForward]] writer.
    */
  def encode(v: V): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def wU16(x: Int): Unit = { out.write((x >> 8) & 0xFF); out.write(x & 0xFF) }
    def wU32(x: Long): Unit = {
      out.write(((x >> 24) & 0xFF).toInt); out.write(((x >> 16) & 0xFF).toInt)
      out.write(((x >> 8) & 0xFF).toInt); out.write((x & 0xFF).toInt)
    }
    def go(v: V): Unit = v match {
      case MNil => out.write(0xc0)
      case MBool(b) => out.write(if (b) 0xc3 else 0xc2)
      case MInt(x) =>
        if (x >= 0 && x < 128) out.write(x.toInt)
        else if (x < 0 && x >= -32) out.write(0xe0 | (x.toInt & 0x1f))
        else { out.write(0xd3); wU32(x >>> 32); wU32(x & 0xFFFFFFFFL) }
      case MFloat(d) =>
        out.write(0xcb)
        val bits = java.lang.Double.doubleToLongBits(d)
        wU32(bits >>> 32); wU32(bits & 0xFFFFFFFFL)
      case ms: MStr =>
        val b = ms.bytes // wire bytes when decoded, so re-encode is lossless
        if (b.length < 32) out.write(0xa0 | b.length)
        else if (b.length < 256) { out.write(0xd9); out.write(b.length) }
        else if (b.length < 65536) { out.write(0xda); wU16(b.length) }
        else { out.write(0xdb); wU32(b.length.toLong) }
        out.write(b)
      case MBin(b) =>
        if (b.length < 256) { out.write(0xc4); out.write(b.length) }
        else if (b.length < 65536) { out.write(0xc5); wU16(b.length) }
        else { out.write(0xc6); wU32(b.length.toLong) }
        out.write(b)
      case MArr(items) =>
        if (items.size < 16) out.write(0x90 | items.size)
        else if (items.size < 65536) { out.write(0xdc); wU16(items.size) }
        else { out.write(0xdd); wU32(items.size.toLong) }
        items.foreach(go)
      case MMap(entries) =>
        if (entries.size < 16) out.write(0x80 | entries.size)
        else if (entries.size < 65536) { out.write(0xde); wU16(entries.size) }
        else { out.write(0xdf); wU32(entries.size.toLong) }
        entries.foreach { case (k, v2) => go(k); go(v2) }
      case MExt(t, data) =>
        data.length match {
          case 4 => out.write(0xd6)
          case 8 => out.write(0xd7)
          case 16 => out.write(0xd8)
          case n if n < 256 => out.write(0xc7); out.write(n)
          case n if n < 65536 => out.write(0xc8); wU16(n)
          case n => out.write(0xc9); wU32(n.toLong)
        }
        out.write(t.toInt); out.write(data)
    }
    go(v)
    out.toByteArray
  }

  /** The sender's `chunk` ack request from a Forward entry's trailing
    * option map — when present the server must reply `{"ack": id}`
    * (forward protocol at-least-once handshake).
    */
  def forwardChunkId(v: V): Option[String] = {
    def chunkOf(opt: V): Option[String] = opt match {
      case MMap(es) => es.collectFirst {
        case (MStr("chunk"), MStr(id)) => id
        case (MStr("chunk"), MBin(b)) => new String(b, "UTF-8")
      }
      case _ => None
    }
    v match {
      case MArr(items) if items.size >= 3 => items.last match {
        case m: MMap if (items(1) match { // option map only in 3rd+ slot
          case _: MArr | _: MBin => items.size >= 3 // Forward/Packed: [tag, entries, opt]
          case _ => items.size >= 4                 // Message: [tag, t, rec, opt]
        }) => chunkOf(m)
        case _ => None
      }
      case _ => None
    }
  }

  /** Encode the ack reply `{"ack": id}`. The id is SENDER-controlled,
    * so every string tier is needed (a truncated str8 length for a
    * ≥256-byte id would corrupt the ack and make the sender retransmit
    * forever).
    */
  def encodeAck(chunkId: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x81) // fixmap(1)
    val k = "ack".getBytes("UTF-8")
    out.write(0xa0 | k.length); out.write(k)
    val v = chunkId.getBytes("UTF-8")
    if (v.length < 32) out.write(0xa0 | v.length)
    else if (v.length < 256) { out.write(0xd9); out.write(v.length) }
    else if (v.length < 65536) {
      out.write(0xda); out.write((v.length >> 8) & 0xFF); out.write(v.length & 0xFF)
    } else {
      out.write(0xdb)
      out.write((v.length >> 24) & 0xFF); out.write((v.length >> 16) & 0xFF)
      out.write((v.length >> 8) & 0xFF); out.write(v.length & 0xFF)
    }
    out.write(v)
    out.toByteArray
  }
}
