package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.TdSink
import graft.sources.Msgpack._

/** Treasure Data import-body codec (out_td td.c:44-102): the time-led
  * msgpack map stream must round-trip through gzip, and the decoder
  * must reject desynced or time-less streams instead of misreading
  * them.
  */
class TdSinkSpec extends AnyFunSuite {

  test("encode/decode round-trips a record batch through gzip") {
    val records = Seq(
      (1700000000L, Seq[(String, V)]("event_id" -> MInt(1),
        "props" -> MStr("""{"k": 1}"""))),
      (1700000060L, Seq[(String, V)]("event_id" -> MInt(-5),
        "props" -> MStr("naïve ünïcode"))),
      (0L, Seq[(String, V)]("empty" -> MStr(""))))
    val body = TdSink.encodeBody(records)
    // gzip magic
    assert((body(0) & 0xff) == 0x1f && (body(1) & 0xff) == 0x8b)
    val back = TdSink.decodeBody(body)
    assert(back.map(_._1) == Seq(1700000000L, 1700000060L, 0L))
    assert(back(0)._2("event_id") == MInt(1))
    assert(back(1)._2("props") == MStr("naïve ünïcode"))
    assert(back(2)._2("empty") == MStr(""))
  }

  test("empty batch encodes to an empty stream") {
    assert(TdSink.decodeBody(TdSink.encodeBody(Nil)).isEmpty)
  }

  test("decoder rejects a record without the integer time key") {
    val body = TdSink.encodeBody(Seq((7L, Seq[(String, V)]())))
    // re-encode a map lacking "time"
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(graft.sources.Msgpack.encode(
      MMap(Vector((MStr("notime"): V) -> (MInt(1): V)))))
    gz.close()
    assertThrows[IllegalArgumentException] {
      TdSink.decodeBody(bos.toByteArray)
    }
    // the well-formed body still decodes
    assert(TdSink.decodeBody(body).head._1 == 7L)
  }

  test("decoder rejects a non-map stream element") {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(graft.sources.Msgpack.encode(MArr(Vector(MInt(1)))))
    gz.close()
    assertThrows[IllegalArgumentException] {
      TdSink.decodeBody(bos.toByteArray)
    }
  }
}
