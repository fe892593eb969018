package graft.parse

/** Minimal protobuf wire codec shared by the hand-rolled binary readers
  * (prometheus remote-write [[PromRemoteWrite]], OTLP [[OtlpProto]]).
  * There is no protobuf runtime on the classpath, so the varint/TLV
  * layer is hand-rolled — the same approach as
  * [[graft.sources.Msgpack]] for the Forward protocol.
  */
object Proto {

  /** Array-backed append buffer — the encode hot path writes millions
    * of bytes per body batch, so this avoids the per-byte boxing an
    * `ArrayBuffer[Byte]` would pay.
    */
  final class Writer {
    private var buf = new Array[Byte](256)
    private var n = 0
    def size: Int = n
    private def ensure(extra: Int): Unit = {
      if (n + extra > buf.length) {
        var cap = buf.length << 1
        while (cap < n + extra) cap <<= 1
        buf = java.util.Arrays.copyOf(buf, cap)
      }
    }
    def rawByte(b: Byte): Unit = { ensure(1); buf(n) = b; n += 1 }
    def rawAll(b: Array[Byte], off: Int, len: Int): Unit = {
      ensure(len); System.arraycopy(b, off, buf, n, len); n += len
    }
    /** Bare little-endian fixed64 payload (packed repeated encodings). */
    def rawFixed64(bits: Long): Unit = {
      ensure(8)
      var i = 0
      while (i < 8) { buf(n + i) = ((bits >>> (8 * i)) & 0xff).toByte; i += 1 }
      n += 8
    }
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { rawByte(((v & 0x7f) | 0x80).toByte); v >>>= 7 }
      rawByte((v & 0x7f).toByte)
    }
    def tag(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def bytes(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length.toLong); rawAll(b, 0, b.length)
    }
    def str(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def fixed64(field: Int, bits: Long): Unit = { tag(field, 1); rawFixed64(bits) }
    def fixed32(field: Int, bits: Int): Unit = {
      tag(field, 5)
      ensure(4)
      var i = 0
      while (i < 4) { buf(n + i) = ((bits >>> (8 * i)) & 0xff).toByte; i += 1 }
      n += 4
    }
    def double(field: Int, v: Double): Unit =
      fixed64(field, java.lang.Double.doubleToLongBits(v))
    def int64(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def bool(field: Int, v: Boolean): Unit = int64(field, if (v) 1L else 0L)
    /** Nested message from a sub-writer. */
    def msg(field: Int, w: Writer): Unit = {
      tag(field, 2); varint(w.n.toLong); rawAll(w.buf, 0, w.n)
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, n)
  }

  /** Every read and skip is bounds-checked against `end` — nested
    * sub-readers share the backing array, so an unchecked length in a
    * truncated or hostile body (these decoders sit behind listening
    * HTTP sources) would otherwise read sibling bytes or, worse, a
    * negative wire-2 length would move `pos` backwards and loop forever.
    */
  final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (shift < 64) {
        if (pos >= end) throw new IllegalArgumentException("truncated varint")
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def fixed64(): Long = {
      if (pos + 8 > end) throw new IllegalArgumentException("truncated fixed64")
      var v = 0L; var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def fixed32(): Int = {
      if (pos + 4 > end) throw new IllegalArgumentException("truncated fixed32")
      var v = 0; var i = 0
      while (i < 4) { v |= (buf(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4; v
    }
    def double(): Double = java.lang.Double.longBitsToDouble(fixed64())
    private def boundedLen(): Int = {
      val n = varint().toInt
      if (n < 0 || pos + n > end) throw new IllegalArgumentException("bad length")
      n
    }
    def lenSlice(): Reader = {
      val n = boundedLen()
      val r = new Reader(buf, pos, pos + n); pos += n; r
    }
    def strField(): String = {
      val n = boundedLen()
      val s = new String(buf, pos, n, "UTF-8"); pos += n; s
    }
    def bytesField(): Array[Byte] = {
      val n = boundedLen()
      val b = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; b
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 =>
        if (pos + 8 > end) throw new IllegalArgumentException("truncated fixed64")
        pos += 8
      // two statements: `pos += boundedLen()` would read the old pos
      // before boundedLen() advances it past the length varint
      case 2 => val n = boundedLen(); pos += n
      case 5 =>
        if (pos + 4 > end) throw new IllegalArgumentException("truncated fixed32")
        pos += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }
  }
}
