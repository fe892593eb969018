package graft

import graft.functions.WarcScan
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

/** [[WarcScan.compute]] against well-formed, hostile, and boundary
  * blobs — the scanner must never throw and must resynchronize past
  * corrupt records (one bad record in a crawl segment cannot drop the
  * rest).
  */
class WarcSpec extends AnyFunSuite {

  private def rec(typ: String, uri: String, payload: String): String = {
    val body = payload.getBytes("UTF-8")
    s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: ${body.length}\r\n\r\n" +
      payload + "\r\n\r\n"
  }

  private def scan(s: String): Seq[InternalRow] = {
    val arr = WarcScan.compute(s.getBytes("UTF-8")).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i => arr.getStruct(i, 5).copy())
  }

  private def payloadOf(r: InternalRow): String = r.getUTF8String(4).toString

  test("parses consecutive records with types, uris, lengths") {
    val rows = scan(rec("warcinfo", "meta", "") +
      rec("conversion", "https://a/1", "hello world") +
      rec("conversion", "https://a/2", "second"))
    assert(rows.map(_.getUTF8String(0).toString) ==
      Seq("warcinfo", "conversion", "conversion"))
    assert(rows.map(_.getLong(3)) == Seq(0L, 11L, 6L))
    assert(rows.map(payloadOf) == Seq("", "hello world", "second"))
    assert(rows(1).getUTF8String(1).toString == "https://a/1")
    assert(rows(1).getUTF8String(2).toString == "2026-01-01T00:00:00Z")
  }

  test("content-length framing keeps separator bytes inside a payload") {
    val tricky = "a\r\n\r\nWARC/1.0 fake\r\n\r\nb"
    val rows = scan(rec("conversion", "u", tricky) + rec("conversion", "v", "tail"))
    assert(rows.map(payloadOf) == Seq(tricky, "tail"))
  }

  test("content length counts octets, payload slices by bytes not chars") {
    val uni = "café 世界" // 4+1+1 chars, 5+1+6 bytes
    val rows = scan(rec("conversion", "u", uni))
    assert(rows.map(_.getLong(3)) == Seq(uni.getBytes("UTF-8").length.toLong))
    assert(payloadOf(rows.head) == uni)
  }

  test("bad content-length resyncs to the next record") {
    val bad = "WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: banana\r\n\r\nx\r\n\r\n"
    val rows = scan(bad + rec("conversion", "ok", "kept"))
    assert(rows.map(payloadOf) == Seq("kept"))
  }

  test("oversized content-length (beyond the blob) drops only that record") {
    val bad = "WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 999999\r\n\r\nx\r\n\r\n"
    val rows = scan(bad + rec("conversion", "ok", "kept"))
    assert(rows.map(payloadOf) == Seq("kept"))
  }

  test("unterminated header block at EOF yields nothing and no throw") {
    assert(scan("WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 4").isEmpty)
    assert(scan("WARC/1.0\r\nWARC-Typ").isEmpty)
    assert(scan("").isEmpty)
    assert(scan("WARC/").isEmpty)
  }

  test("garbage before, between, and after records is skipped") {
    val rows = scan("junk junk\r\n" + rec("conversion", "a", "one") +
      "<html>noise</html>" + rec("conversion", "b", "two") + "trailing")
    assert(rows.map(payloadOf) == Seq("one", "two"))
  }

  test("bare-LF line endings and missing optional headers are tolerated") {
    val lf = "WARC/1.0\nWARC-Type: conversion\nContent-Length: 3\n\nabc\n\n"
    val rows = scan(lf)
    assert(rows.map(payloadOf) == Seq("abc"))
    assert(rows.head.isNullAt(1) && rows.head.isNullAt(2)) // no URI/date
  }

  test("multibyte UTF-8 header values survive undamaged") {
    // URIs in real crawls carry UTF-8; a chars-based decode would
    // mojibake them (ISO-8859-1 read + UTF-8 re-encode doubles bytes)
    val rows = scan(rec("conversion", "https://example.com/café/世界", "x"))
    assert(rows.head.getUTF8String(1).toString == "https://example.com/café/世界")
  }

  test("header names are case-insensitive, values are trimmed") {
    val r = "WARC/1.0\r\ncontent-length:  2 \r\nwarc-type:  response \r\n\r\nhi\r\n\r\n"
    val rows = scan(r)
    assert(rows.head.getUTF8String(0).toString == "response")
    assert(payloadOf(rows.head) == "hi")
  }

  test("zero-length payload record followed by another record") {
    val rows = scan(rec("warcinfo", "u", "") + rec("conversion", "v", "x"))
    assert(rows.map(_.getLong(3)) == Seq(0L, 1L))
  }

  test("gzip segments inflate off the magic bytes; corrupt gzip yields nothing") {
    import graft.functions.GzipCompress
    val plain = rec("conversion", "u", "compressed payload")
    val gz = GzipCompress.compute(plain.getBytes("UTF-8"))
    val arr = WarcScan.compute(gz).asInstanceOf[ArrayData]
    assert(arr.numElements() == 1)
    assert(arr.getStruct(0, 5).getUTF8String(4).toString == "compressed payload")
    // gzip magic but corrupt stream: no records, no throw
    val corrupt = Array[Byte](0x1f, 0x8b.toByte, 9, 9, 9, 9, 9, 9)
    assert(WarcScan.compute(corrupt).asInstanceOf[ArrayData].numElements() == 0)
  }

  test("property: any payload corpus round-trips through build→scan") {
    // payloads draw from the adversarial alphabet: CRLFs, the WARC/
    // magic, colons, header-shaped lines, multibyte unicode — framing
    // must be immune to ALL content because Content-Length drives it
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val payloadGen: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.const("\r\n"), Gen.const("\r\n\r\n"),
      Gen.const("WARC/1.0"), Gen.const("Content-Length: 7"),
      Gen.const("日本語テキスト"), Gen.const("café"),
      Gen.const(": colon : everywhere :"))).map(_.mkString(" "))
    val corpusGen = Gen.listOfN(20, payloadGen)
    (1 to 40).foreach { i =>
      val payloads = corpusGen(Gen.Parameters.default, Seed(i.toLong)).get
      val blob = payloads.zipWithIndex.map { case (p, j) =>
        rec("conversion", s"uri/$j", p) }.mkString
      val rows = scan(blob)
      assert(rows.map(payloadOf) == payloads, s"seed $i")
      assert(rows.map(_.getLong(3)) ==
        payloads.map(_.getBytes("UTF-8").length.toLong), s"seed $i lengths")
    }
  }
}
