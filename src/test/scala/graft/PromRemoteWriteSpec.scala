package graft

import graft.parse.PromRemoteWrite
import graft.parse.PromRemoteWrite.{RwLabel, RwSample, RwSeries}
import org.scalatest.funsuite.AnyFunSuite

/** Wire-level matrix for the hand-rolled prometheus remote-write codec
  * (prompb WriteRequest), plus a compatibility decode of the reference's
  * own binary test payload when present.
  */
class PromRemoteWriteSpec extends AnyFunSuite {

  private def rt(series: Seq[RwSeries]): Seq[RwSeries] =
    PromRemoteWrite.decode(PromRemoteWrite.encode(series))

  test("single series round trip, __name__ first") {
    val s = Seq(RwSeries(
      Seq(RwLabel("__name__", "http_requests_total"),
        RwLabel("job", "api"), RwLabel("instance", "i-1")),
      Seq(RwSample(42.5, 1704067200000L))))
    assert(rt(s) == s)
  }

  test("varint edges: 0, 127, 128, two-byte, large, negative int64") {
    val tss = Seq(0L, 127L, 128L, 300L, 16383L, 16384L,
      1704067200000L, Long.MaxValue, -1L, Long.MinValue)
    val s = Seq(RwSeries(Seq(RwLabel("__name__", "m")),
      tss.map(t => RwSample(t.toDouble, t))))
    assert(rt(s) == s)
  }

  test("double edges: NaN bits, infinities, -0.0 preserved") {
    val vs = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, -0.0, 4.9e-324)
    val s = Seq(RwSeries(Seq(RwLabel("__name__", "m")),
      vs.map(v => RwSample(v, 1L))))
    val got = rt(s).head.samples.map(_.value)
    got.zip(vs).foreach { case (g, v) =>
      assert(java.lang.Double.doubleToRawLongBits(g) ==
        java.lang.Double.doubleToRawLongBits(v))
    }
  }

  test("multi-series, empty labels, empty samples, utf-8 label values") {
    val s = Seq(
      RwSeries(Seq(RwLabel("__name__", "a"), RwLabel("λ", "héllo✓")),
        Seq(RwSample(1.0, 1L), RwSample(2.0, 2L))),
      RwSeries(Nil, Seq(RwSample(3.0, 3L))),
      RwSeries(Seq(RwLabel("only", "labels")), Nil))
    assert(rt(s) == s)
  }

  test("unknown fields are skipped by wire type") {
    // TimeSeries with exemplars (field 3, LEN) and an unknown fixed32
    // (field 9, wire 5) interleaved between labels and samples
    val label = { // Label{name:"__name__" value:"m"}
      val n = "__name__".getBytes("UTF-8"); val v = "m".getBytes("UTF-8")
      Array[Byte](0x0a, n.length.toByte) ++ n ++
        Array[Byte](0x12, v.length.toByte) ++ v
    }
    val sample = Array[Byte](0x09, 0, 0, 0, 0, 0, 0, -16, 0x3f, 0x10, 7)
    val exemplar = Array[Byte](0x1a, 2, 0x10, 1) // field 3 LEN, 2 bytes
    val unknown5 = Array[Byte](0x4d, 1, 2, 3, 4) // field 9, wire 5
    val ts = Array[Byte](0x0a, label.length.toByte) ++ label ++
      exemplar ++ unknown5 ++
      Array[Byte](0x12, sample.length.toByte) ++ sample
    val req = Array[Byte](0x0a, ts.length.toByte) ++ ts
    val got = PromRemoteWrite.decode(req)
    assert(got == Seq(RwSeries(Seq(RwLabel("__name__", "m")),
      Seq(RwSample(1.0, 7L)))))
  }

  test("snappy round trip and raw fallback") {
    val s = Seq(RwSeries(Seq(RwLabel("__name__", "m")),
      Seq(RwSample(1.5, 9L))))
    val raw = PromRemoteWrite.encode(s)
    val z = PromRemoteWrite.snappyCompress(raw)
    assert(!java.util.Arrays.equals(z, raw))
    assert(PromRemoteWrite.decode(PromRemoteWrite.maybeUncompress(z)) == s)
    // a body that is already uncompressed protobuf still decodes
    assert(PromRemoteWrite.decode(PromRemoteWrite.maybeUncompress(raw)) == s)
  }

  test("malformed body throws (reference answers 400)") {
    intercept[Exception] {
      PromRemoteWrite.decode(Array[Byte](0x0a, 0x7f, 1, 2))
    }
  }

  test("negative wire-2 skip length throws instead of looping") {
    // field 9, wire 2, length = 5-byte varint 0xFFFFFFFA (-6 after toInt
    // truncation) — an unchecked `pos += n` would move pos backwards onto
    // the same tag and spin forever. Must throw promptly instead.
    val evil = Array[Byte](0x4a.toByte,
      0xfa.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x0f)
    intercept[IllegalArgumentException] { PromRemoteWrite.decode(evil) }
  }

  test("truncated varint / fixed64 / fixed32 skips throw, not misparse") {
    // series slice ends mid-varint: WriteRequest field 1 len=1, body 0x80
    intercept[IllegalArgumentException] {
      PromRemoteWrite.decode(Array[Byte](0x0a, 1, 0x80.toByte))
    }
    // field 2 wire 1 (fixed64) with only 3 bytes left
    intercept[IllegalArgumentException] {
      PromRemoteWrite.decode(Array[Byte](0x11, 1, 2, 3))
    }
    // field 2 wire 5 (fixed32) with only 1 byte left
    intercept[IllegalArgumentException] {
      PromRemoteWrite.decode(Array[Byte](0x15, 1))
    }
  }

  test("nested truncation cannot read sibling bytes") {
    // Label slice claims len 3 but its value field runs past the slice end
    // into the next sibling; bounded readers must throw.
    val ts = Array[Byte](0x0a, 3, 0x0a, 9, 'x') // label len 3: name len 9 (overruns)
    val req = Array[Byte](0x0a, ts.length.toByte) ++ ts
    intercept[IllegalArgumentException] { PromRemoteWrite.decode(req) }
  }

  test("reference golden payload decodes (wire compatibility)") {
    val p = java.nio.file.Paths.get(
      "/root/reference/lib/cmetrics/tests/prometheus_remote_write_payload.bin")
    assume(java.nio.file.Files.isReadable(p), "reference payload not present")
    val series = PromRemoteWrite.decode(java.nio.file.Files.readAllBytes(p))
    assert(series.nonEmpty)
    val first = series.head
    assert(first.labels.head ==
      RwLabel("__name__", "kubernetes_network_load_counter"))
    assert(first.samples.head.value == 3.0)
    // every series carries a __name__ label and at least one sample
    assert(series.forall(s => s.labels.exists(_.name == "__name__")))
    assert(series.forall(_.samples.nonEmpty))
  }
}
