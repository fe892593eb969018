package graft.sinks

import java.io.ByteArrayOutputStream
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import graft.sources.Msgpack
import graft.sources.Msgpack._

/** Treasure Data import bodies (out_td `plugins/out_td/td.c:44-102` +
  * `td_http.c:40-90`): each record re-packs as a msgpack map whose FIRST
  * key is `time` (integer epoch seconds, td.c:79-81), followed by the
  * record's own fields; a request body is the bare concatenation of
  * those maps (no array wrapper), gzip-compressed, PUT to
  * `/v3/table/import/<db>/<table>/msgpack.gz` as `application/gzip`.
  *
  * Wire codecs are JVM functions, not Columns — queries batch records
  * into bodies with a typed mapPartitions like the remote-write sink.
  */
object TdSink {

  /** One import body from (timeSec, record-fields) rows. */
  def encodeBody(records: Seq[(Long, Seq[(String, V)])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    records.foreach { case (timeSec, fields) =>
      val entries = ((MStr("time"): V) -> (MInt(timeSec): V)) +:
        fields.map { case (k, v) => (MStr(k): V) -> v }.toVector
      gz.write(Msgpack.encode(MMap(entries)))
    }
    gz.finish()
    gz.close()
    bos.toByteArray
  }

  /** Inverse: gunzip, then decode the msgpack map stream back into
    * (timeSec, fields) rows — the gate for the encode path.
    */
  def decodeBody(body: Array[Byte]): Seq[(Long, Map[String, V])] = {
    val gz = new GZIPInputStream(new java.io.ByteArrayInputStream(body))
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = gz.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = gz.read(buf) }
    val bytes = bos.toByteArray
    val out = Seq.newBuilder[(Long, Map[String, V])]
    var off = 0
    while (off < bytes.length) {
      val (v, next) = Msgpack.decode(bytes, off)
      v match {
        case MMap(entries) =>
          val m = entries.collect { case (MStr(k), value) => k -> value }.toMap
          val t = m.get("time") match {
            case Some(MInt(s)) => s
            case other => throw new IllegalArgumentException(
              s"td record lacks integer time key: $other")
          }
          out += ((t, m - "time"))
        case other => throw new IllegalArgumentException(
          s"td body must be a map stream, got $other")
      }
      off = next
    }
    out.result()
  }
}
