package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.sql.types.{ArrayType, DataType, BinaryType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** WARC (ISO 28500 / WARC-1.1) record scanner over a raw byte blob.
  *
  * Common Crawl — the de-facto source corpus of every large-scale LLM
  * training pipeline — ships as concatenated WARC records (and the
  * text-extracted WET variant, which is the same container with
  * `WARC-Type: conversion` records). This expression walks one blob:
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: conversion\r\n
  * WARC-Target-URI: https://…\r\n
  * Content-Length: N\r\n
  * \r\n
  * <N payload bytes>\r\n\r\n
  * }}}
  *
  * and returns `array<struct<warc_type, target_uri, warc_date,
  * content_length, payload>>`. Payload slicing is Content-Length-driven
  * (a payload may legally contain the record separator), all reads are
  * bounds-checked, and a malformed header block (no terminating blank
  * line, unparsable/oversized Content-Length) resynchronizes by
  * scanning for the next `WARC/` magic instead of aborting the blob —
  * one corrupt record in a 1 GB crawl segment must not drop the
  * remaining records.
  *
  * Runs inside whole-stage codegen; the per-blob work is a single
  * forward walk with no allocation beyond the emitted rows.
  */
case class WarcScan(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", StringType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"warc_scan needs a binary blob, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WarcScan.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WarcScan.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "warc_scan"
}

object WarcScan {
  private val Magic = "WARC/".getBytes("US-ASCII")

  /** Index of the next `WARC/` magic at or after `from`, or -1. */
  private def findMagic(b: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = b.length - Magic.length
    while (i <= last) {
      var j = 0
      while (j < Magic.length && b(i + j) == Magic(j)) j += 1
      if (j == Magic.length) return i
      i += 1
    }
    -1
  }

  /** End (exclusive) of the line starting at `i`: index of '\n', or n. */
  private def lineEnd(b: Array[Byte], i: Int): Int = {
    var j = i
    while (j < b.length && b(j) != '\n') j += 1
    j
  }

  /** Line content [i, end) with a trailing '\r' stripped, as ASCII-ish
    * String (header names/values are ASCII per spec; URI bytes survive
    * the ISO-8859-1 round trip unchanged).
    */
  private def lineStr(b: Array[Byte], i: Int, end: Int): String = {
    var e = end
    if (e > i && b(e - 1) == '\r') e -= 1
    new String(b, i, e - i, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** Static entry shared by eval and generated code. Real WET segments
    * ship as `.warc.wet.gz` — a gzip-magic blob inflates first (size
    * cap via the shared bounded reader), exactly like a real ingester.
    */
  def compute(raw: Array[Byte]): ArrayData = {
    val blob =
      if (!graft.parse.OtlpProto.isGzip(raw)) raw
      else scala.util.Try(graft.parse.OtlpProto.gunzip(raw))
        .getOrElse(Array.emptyByteArray) // corrupt/bomb gzip: no records
    val n = blob.length
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var i = findMagic(blob, 0)
    while (i >= 0 && i < n) {
      // version line ("WARC/1.0"); content ignored beyond the magic
      var p = lineEnd(blob, i) + 1
      var warcType: UTF8String = null
      var targetUri: UTF8String = null
      var warcDate: UTF8String = null
      var contentLength = -1L
      var ok = false // saw the blank line that closes the header block
      var done = false
      while (!done && p < n) {
        val e = lineEnd(blob, p)
        val line = lineStr(blob, p, e)
        if (line.isEmpty) { ok = true; done = true }
        else {
          val c = line.indexOf(':')
          if (c > 0) {
            val name = line.substring(0, c).trim
            val value = line.substring(c + 1).trim
            if (name.equalsIgnoreCase("WARC-Type"))
              warcType = UTF8String.fromString(value)
            else if (name.equalsIgnoreCase("WARC-Target-URI"))
              targetUri = UTF8String.fromString(value)
            else if (name.equalsIgnoreCase("WARC-Date"))
              warcDate = UTF8String.fromString(value)
            else if (name.equalsIgnoreCase("Content-Length"))
              contentLength =
                try java.lang.Long.parseLong(value)
                catch { case _: NumberFormatException => -1L }
          }
          // headerless junk lines are skipped; resync happens below if
          // the block never terminates
        }
        p = e + 1
      }
      if (ok && contentLength >= 0 && p + contentLength <= n) {
        val payload = UTF8String.fromBytes(blob, p, contentLength.toInt)
        out += new GenericInternalRow(Array[Any](
          warcType, targetUri, warcDate, contentLength, payload))
        // skip the record separator (CRLF CRLF); tolerate bare LFs
        var q = p + contentLength.toInt
        var seps = 0
        while (q < n && seps < 2 && (blob(q) == '\r' || blob(q) == '\n')) {
          if (blob(q) == '\n') seps += 1
          q += 1
        }
        i = if (q >= n) -1 else findMagic(blob, q)
      } else {
        // malformed record: resync at the next magic after this one
        i = findMagic(blob, i + Magic.length)
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** gzip-compress a binary column (RFC 1952). Java's GZIPOutputStream
  * writes a fixed zero MTIME, so output is deterministic. Used to build
  * `.warc.wet.gz`-shaped test segments and by delivery paths that gzip
  * request bodies.
  */
case class GzipCompress(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gzip_compress needs binary input, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    GzipCompress.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GzipCompress.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "gzip_compress"
}

object GzipCompress {
  def compute(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(b.length / 2 max 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }
}

object WarcFunctions {
  /** WARC/WET blob → array of parsed records (ISO 28500). */
  def warcScan(blob: Column): Column = shim.column(WarcScan(shim.expression(blob)))

  /** RFC 1952 gzip compression of a binary column. */
  def gzipCompress(blob: Column): Column =
    shim.column(GzipCompress(shim.expression(blob)))
}
