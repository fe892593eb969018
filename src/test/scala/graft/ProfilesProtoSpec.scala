package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.ProfilesProto
import graft.parse.ProfilesProto.FlatSample

/** Wire-level OTLP profiles codec: encode→decode round trips, the
  * pprof index-0 reservations, packed-field handling, unknown-field
  * tolerance and hostile-body bounds (the same contract matrix the
  * other hand-rolled readers carry).
  */
class ProfilesProtoSpec extends AnyFunSuite {

  private val pid = (0 until 16).map(_.toByte).toArray

  test("round trip: stacks, dictionary sharing, values, metadata") {
    val body = ProfilesProto.encodeProfile(pid, timeUnixNano = 42L,
      sampleType = "cpu", unit = "ns", period = 10L,
      samples = Iterator(
        (Seq("leaf", "mid", "main"), 7L),
        (Seq("leaf2", "main"), 3L),
        (Seq("leaf", "mid", "main"), 5L))) // repeated stack dedups
    val out = ProfilesProto.decode(body)
    assert(out.length == 3)
    assert(out.forall(_.profileId == "000102030405060708090a0b0c0d0e0f"))
    assert(out.forall(s => s.sampleType == "cpu" && s.unit == "ns" &&
      s.period == 10L && s.timeUnixNano == 42L))
    assert(out.map(_.value) == Seq(7L, 3L, 5L))
    assert(out(0).frames == Seq("leaf", "mid", "main"))
    assert(out(1).frames == Seq("leaf2", "main"))
    assert(out(2).frames == Seq("leaf", "mid", "main"))
  }

  test("single-frame and empty-value samples flatten safely") {
    val body = ProfilesProto.encodeProfile(pid, 0L, "samples", "count", 1L,
      Iterator((Seq("only"), 1L)))
    val out = ProfilesProto.decode(body)
    assert(out == Seq(FlatSample("000102030405060708090a0b0c0d0e0f", 0L,
      "samples", "count", 1L, Seq("only"), 1L)))
  }

  test("unknown fields skip by wire type; empty body decodes to nothing") {
    val body = ProfilesProto.encodeProfile(pid, 1L, "t", "u", 1L,
      Iterator((Seq("f"), 9L)))
    // append an unknown top-level field (field 15, varint)
    val extra = body ++ Array[Byte]((15 << 3).toByte, 0x01)
    assert(ProfilesProto.decode(extra).map(_.value) == Seq(9L))
    assert(ProfilesProto.decode(Array.empty[Byte]).isEmpty)
  }

  test("hostile bodies: truncated and over-long lengths throw, never loop") {
    val body = ProfilesProto.encodeProfile(pid, 1L, "t", "u", 1L,
      Iterator((Seq("f"), 9L)))
    intercept[IllegalArgumentException] {
      ProfilesProto.decode(body.dropRight(3))
    }
    // wire-2 field with a length pointing past the end
    intercept[IllegalArgumentException] {
      ProfilesProto.decode(Array[Byte]((1 << 3 | 2).toByte, 0x7f, 0x01))
    }
  }

  test("out-of-range indices resolve to empty names, not exceptions") {
    // hand-build: dictionary with 1 string, a sample whose stack index
    // points past the table
    import graft.parse.Proto.Writer
    val dict = new Writer
    dict.str(5, "")
    val sample = new Writer
    sample.int64(1, 99L) // bogus stack index
    val pv = new Writer; pv.varint(5L)
    sample.msg(4, pv)
    val profile = new Writer
    profile.msg(2, sample)
    val sp = new Writer; sp.msg(2, profile)
    val rp = new Writer; rp.msg(2, sp)
    val req = new Writer
    req.msg(1, rp); req.msg(2, dict)
    val out = ProfilesProto.decode(req.result())
    assert(out.length == 1 && out.head.frames.isEmpty &&
      out.head.value == 5L)
  }
}
