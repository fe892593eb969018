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
  private type Writer = Proto.Writer

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
  /** Bounds-checked reads/skips live in [[Proto.Reader]] — this decoder
    * sits behind a listening HTTP source, so hostile lengths must never
    * escape a body slice. The reference decoder bounds-checks all
    * lengths the same way.
    */
  private type Reader = Proto.Reader

  /** Parse uncompressed WriteRequest bytes. Throws on malformed input
    * (the reference answers 400 in that case, prom_rw_prot.c:74-76).
    */
  def decode(raw: Array[Byte]): Seq[RwSeries] = {
    val out = ArrayBuffer.empty[RwSeries]
    val r = new Reader(raw)
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
