package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.xerial.snappy.Snappy

import scala.collection.mutable.ArrayBuffer

/** Prometheus remote-write ingest — the analogue of the reference's
  * `plugins/in_prometheus_remote_write` (prom_rw_prot.c:63-95 hands the
  * POST body to cmetrics' `cmt_decode_prometheus_remote_write.c`, after
  * the HTTP layer snappy-uncompresses it per Content-Encoding,
  * flb_http_common.c:459-460).
  *
  * The wire format is the public Prometheus `WriteRequest` protobuf
  * (prometheus/prompb/remote.proto + types.proto):
  *
  * {{{
  * WriteRequest { repeated TimeSeries timeseries = 1; }
  * TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2; }
  * Label        { string name = 1; string value = 2; }
  * Sample       { double value = 1; int64 timestamp = 2; }  // ms epoch
  * }}}
  *
  * There is no protobuf runtime on the classpath, so the varint/TLV codec
  * is hand-rolled (same approach as [[graft.sources.Msgpack]] for the
  * Forward protocol); snappy block compression comes from `snappy-java`,
  * which ships with Spark. Unknown fields (exemplars, histograms,
  * metadata) are skipped by wire type, as protobuf requires.
  *
  * Semantics matched from cmt_decode_prometheus_remote_write.c: the
  * metric name is the `__name__` label (`cmt_metric_name_from_labels`,
  * :44-71); every other label is a dimension; one event per sample. The
  * decoded frame mirrors [[Parsers.promText]]'s (name, labels, value,
  * ts_ms) so scrape- and push-ingested metrics land in one schema.
  */
object PromRemoteWrite {

  final case class RwLabel(name: String, value: String)
  final case class RwSample(value: Double, timestampMs: Long)
  final case class RwSeries(labels: Seq[RwLabel], samples: Seq[RwSample])

  // ---------------------------------------------------------------- write
  private final class Writer {
    val out = new ArrayBuffer[Byte](256)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      out += (v & 0x7f).toByte
    }
    def tag(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def bytes(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length.toLong); out ++= b
    }
    def str(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def fixed64(field: Int, bits: Long): Unit = {
      tag(field, 1)
      var i = 0
      while (i < 8) { out += ((bits >>> (8 * i)) & 0xff).toByte; i += 1 }
    }
    def int64(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def result(): Array[Byte] = out.toArray
  }

  /** Serialize a WriteRequest (uncompressed protobuf bytes). */
  def encode(series: Seq[RwSeries]): Array[Byte] = {
    val w = new Writer
    series.foreach { ts =>
      val tsw = new Writer
      ts.labels.foreach { l =>
        val lw = new Writer
        lw.str(1, l.name); lw.str(2, l.value)
        tsw.bytes(1, lw.result())
      }
      ts.samples.foreach { s =>
        val sw = new Writer
        sw.fixed64(1, java.lang.Double.doubleToLongBits(s.value))
        sw.int64(2, s.timestampMs)
        tsw.bytes(2, sw.result())
      }
      w.bytes(1, tsw.result())
    }
    w.result()
  }

  def snappyCompress(raw: Array[Byte]): Array[Byte] = Snappy.compress(raw)

  // ----------------------------------------------------------------- read
  /** Every read and skip is bounds-checked against `end` — nested
    * sub-readers share the backing array, so an unchecked length in a
    * truncated or hostile body (this decoder sits behind a listening
    * HTTP source) would otherwise read sibling bytes or, worse, a
    * negative wire-2 length would move `pos` backwards and loop forever.
    * The reference decoder bounds-checks all lengths the same way.
    */
  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
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

  /** Parse uncompressed WriteRequest bytes. Throws on malformed input
    * (the reference answers 400 in that case, prom_rw_prot.c:74-76).
    */
  def decode(raw: Array[Byte]): Seq[RwSeries] = {
    val out = ArrayBuffer.empty[RwSeries]
    val r = new Reader(raw, 0, raw.length)
    while (r.hasMore) {
      val key = r.varint()
      if ((key >> 3) == 1 && (key & 7) == 2) out += decodeSeries(r.lenSlice())
      else r.skip((key & 7).toInt)
    }
    out.toSeq
  }

  private def decodeSeries(r: Reader): RwSeries = {
    val labels = ArrayBuffer.empty[RwLabel]
    val samples = ArrayBuffer.empty[RwSample]
    while (r.hasMore) {
      val key = r.varint()
      ((key >> 3).toInt, (key & 7).toInt) match {
        case (1, 2) =>
          val lr = r.lenSlice()
          var name = ""; var value = ""
          while (lr.hasMore) {
            val lk = lr.varint()
            ((lk >> 3).toInt, (lk & 7).toInt) match {
              case (1, 2) => name = lr.strField()
              case (2, 2) => value = lr.strField()
              case (_, w) => lr.skip(w)
            }
          }
          labels += RwLabel(name, value)
        case (2, 2) =>
          val sr = r.lenSlice()
          var v = 0.0; var ts = 0L
          while (sr.hasMore) {
            val sk = sr.varint()
            ((sk >> 3).toInt, (sk & 7).toInt) match {
              case (1, 1) => v = java.lang.Double.longBitsToDouble(sr.fixed64())
              case (2, 0) => ts = sr.varint()
              case (_, w) => sr.skip(w)
            }
          }
          samples += RwSample(v, ts)
        case (_, w) => r.skip(w)
      }
    }
    RwSeries(labels.toSeq, samples.toSeq)
  }

  /** Remote-write senders MUST snappy-compress (the reference relies on
    * Content-Encoding, flb_http_common.c:459); accept already-raw bodies
    * too so pre-decompressed relays keep working.
    */
  def maybeUncompress(body: Array[Byte]): Array[Byte] =
    try Snappy.uncompress(body)
    catch {
      // snappy-java throws IOException for most corrupt inputs but
      // SnappyError (an Error) for some; both mean "not snappy, pass raw".
      case _: java.io.IOException          => body
      case _: org.xerial.snappy.SnappyError => body
    }

  // ---------------------------------------------------------- spark-facing
  /** One row per decoded sample: (name, labels, value, ts_ms) — the same
    * frame [[Parsers.promText]] emits, with `__name__` lifted out of the
    * label map (cmt_metric_name_from_labels).
    */
  def decodeBodies(df: DataFrame, body: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(body.cast("binary"))
      .as[Array[Byte]]
      .flatMap { b =>
        // A malformed body must not poison the batch: in streaming the
        // bytes were already buffered (and 201-acked) by the HTTP layer,
        // so a throw here would make Spark retry the same offsets forever.
        // The reference answers 400 per-request and keeps serving
        // (prom_rw_prot.c:74-76); dropping the one bad body is the
        // batch-side equivalent.
        val series =
          scala.util.Try(decode(maybeUncompress(b))).getOrElse(Seq.empty)
        series.flatMap { s =>
          val name = s.labels.collectFirst {
            case RwLabel("__name__", v) => v
          }.orNull
          val dims = s.labels.collect {
            case RwLabel(n, v) if n != "__name__" => n -> v
          }.toMap
          s.samples.map(sm => (name, dims, sm.value, sm.timestampMs))
        }
      }
      .toDF("name", "labels", "value", "ts_ms")
  }
}
