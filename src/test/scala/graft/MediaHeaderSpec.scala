package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MediaFunctions.mediaHeader

/** Wire-level matrix for the MediaHeader magic-byte sniffer: byte-exact
  * container headers (PNG IHDR, JPEG SOFn behind APP segments, GIF LSD,
  * BMP BITMAPINFOHEADER) plus the corrupt/truncated shapes that must
  * sniff NULL rather than misparse.
  */
class MediaHeaderSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def sniff(b: Array[Byte]): Option[(String, Int, Int)] = {
    val r = Seq(Tuple1(b)).toDF("p")
      .select(mediaHeader(col("p")).as("m"))
      .select("m.format", "m.width", "m.height").collect()(0)
    if (r.isNullAt(0)) None else Some((r.getString(0), r.getInt(1), r.getInt(2)))
  }

  private def hexBytes(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("png: IHDR big-endian dims") {
    val b = hexBytes("89504E470D0A1A0A 0000000D 49484452" +
      "00000280 000001E0 08 06 00 00 00 DEADBEEF")
    assert(sniff(b) == Some(("png", 640, 480)))
  }

  test("png: truncated before IHDR payload is null") {
    assert(sniff(hexBytes("89504E470D0A1A0A 0000000D 494844")) == None)
  }

  test("jpeg: SOF0 directly after SOI") {
    val b = hexBytes("FFD8 FFC0 0011 08 01E0 0280 03 011100 021101 031101")
    assert(sniff(b) == Some(("jpeg", 640, 480)))
  }

  test("jpeg: SOF2 (progressive) behind APP0+APP1+fill bytes") {
    val b = hexBytes("FFD8" +
      "FFE0 0004 0000" +        // APP0, len 4
      "FFFF" +                  // fill byte padding before next marker
      "FFE1 0006 00000000" +    // APP1, len 6
      "FFC2 0011 08 0010 0020 03 011100 021101 031101")
    assert(sniff(b) == Some(("jpeg", 32, 16)))
  }

  test("jpeg: DHT (C4) is not a SOF; EOI before SOF is null") {
    val withDht = hexBytes("FFD8 FFC4 0004 0000 FFC0 0011 08 0001 0002 03 011100 021101 031101")
    assert(sniff(withDht) == Some(("jpeg", 2, 1)))
    assert(sniff(hexBytes("FFD8 FFD9")) == None)            // EOI, no frame
    assert(sniff(hexBytes("FFD8 FFE0 0000")) == None)       // bad length < 2
    assert(sniff(hexBytes("FFD8 00C0 0011")) == None)       // desync: no FF
  }

  test("gif: 87a and 89a little-endian dims") {
    assert(sniff("GIF89a".getBytes("US-ASCII") ++ hexBytes("8002 E001 F7")) ==
      Some(("gif", 640, 480)))
    assert(sniff("GIF87a".getBytes("US-ASCII") ++ hexBytes("1000 0800")) ==
      Some(("gif", 16, 8)))
    assert(sniff("GIF88a".getBytes("US-ASCII") ++ hexBytes("10000800")) == None)
  }

  test("bmp: little-endian i32 dims; top-down negative height abs'd") {
    val b = "BM".getBytes("US-ASCII") ++
      hexBytes("00000000 00000000 36000000 28000000 80020000 E0010000")
    assert(sniff(b) == Some(("bmp", 640, 480)))
    val topDown = "BM".getBytes("US-ASCII") ++
      hexBytes("00000000 00000000 36000000 28000000 80020000 20FEFFFF")
    assert(sniff(topDown) == Some(("bmp", 640, 480)))       // -480 → 480
  }

  test("zero/absurd dimensions and unknown containers are null") {
    assert(sniff(hexBytes("89504E470D0A1A0A 0000000D 49484452" +
      "00000000 000001E0 08 06 00 00 00")) == None)          // width 0
    assert(sniff("plain text not an image at all.....".getBytes) == None)
    assert(sniff(Array.empty[Byte]) == None)
  }
}
