package graft.sinks

import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Object-store delivery semantics — the key templating and size-based
  * part rolling of the reference's `plugins/out_s3/s3.c` (the transport
  * itself is a local filesystem stand-in; swapping in a real store
  * client changes the byte sink, not the plan or the key logic).
  *
  * Key format (`flb_get_s3_key`, src/aws/flb_aws_util.c:1065-1208, and
  * the `s3_key_format` config at s3.c:4579): `$TAG[n]` is the n-th
  * tag part split on the delimiter (n ≤ 9; a part that does not exist
  * leaves the token verbatim, with a warning in the reference), then
  * `$TAG` is the whole tag, then `$INDEX` the rolling sequence index,
  * then strftime specifiers are rendered from the chunk's first event
  * time in UTC (gmtime, flb_aws_util.c:1199).
  *
  * Scale shape: the key renders as a codegen'd Column BEFORE the write
  * (no per-row JVM callback for templating), and each partition streams
  * its rows grouped by key with one open file per in-flight (key, part)
  * — the same bounded-buffer-per-key model as the reference's
  * upload_chunk_size rolling (s3.c `upload_chunk_size`, default 5 MiB).
  */
object ObjectStoreSink {

  private val TagPart = raw"\$$TAG\[(\d)\]".r

  /** Render the `s3_key_format` template as a Column. Specifier subset:
    * %Y %m %d %H %M %S (the reference's default format uses exactly
    * these); `$$UUID` renders a random suffix via `uuid()` (sink use
    * only — non-deterministic); `$$INDEX` substitutes `seqIndex` when
    * provided, else stays verbatim like an out-of-bounds tag part.
    */
  def renderKey(template: String, tag: Column, ts: Column,
                tagDelimiter: String = ".",
                seqIndex: Option[Column] = None): Column = {
    val parts = split(tag, java.util.regex.Pattern.quote(tagDelimiter))
    // one fused regex pass over the template, emitting alternating
    // literal and dynamic pieces
    val token = raw"(\$$TAG\[\d\]|\$$TAG|\$$INDEX|\$$UUID|%[YmdHMS])".r
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- token.findAllMatchIn(template)) {
      if (m.start > last) pieces += lit(template.substring(last, m.start))
      pieces += (m.matched match {
        case TagPart(n) =>
          // parts beyond the split leave the token verbatim
          // (flb_aws_util.c:1166-1171 warns and keeps it); try_element_at
          // because ANSI element_at throws on out-of-bounds
          coalesce(try_element_at(parts, lit(n.toInt + 1)), lit(m.matched))
        case "$TAG"   => tag
        case "$INDEX" => seqIndex.map(_.cast("string")).getOrElse(lit("$INDEX"))
        case "$UUID"  => expr("uuid()")
        case "%Y"     => date_format(ts, "yyyy")
        case "%m"     => date_format(ts, "MM")
        case "%d"     => date_format(ts, "dd")
        case "%H"     => date_format(ts, "HH")
        case "%M"     => date_format(ts, "mm")
        case "%S"     => date_format(ts, "ss")
      })
      last = m.end
    }
    if (last < template.length) pieces += lit(template.substring(last))
    if (pieces.isEmpty) lit(template) else concat(pieces.toSeq: _*)
  }

  /** Write serialized record lines under templated keys below `baseDir`,
    * rolling to a new part object once `maxBytes` is exceeded —
    * the reference's size-triggered upload cut (s3.c upload_chunk_size /
    * total_file_size). Part files are `<key>/part-<sparkPartition>-<roll>`
    * so concurrent writers never collide, matching how each output
    * worker owns its own multipart upload.
    *
    * `compression = "gzip"` gzip-compresses each part object (out_s3's
    * `compression gzip` option, s3.c config) and suffixes parts `.gz`;
    * the roll threshold applies to UNCOMPRESSED bytes, matching the
    * reference's chunk-size cut on the raw buffered chunk before
    * compress-at-upload. (The reference's `compression arrow` columnar
    * option maps to Spark's native parquet writer — use
    * `df.write.parquet` for that path, not a line sink.)
    */
  def write(df: DataFrame, baseDir: String, template: String,
            tag: Column, ts: Column, line: Column,
            tagDelimiter: String = ".", maxBytes: Long = 5L * 1024 * 1024,
            compression: String = "none"): Unit = {
    val gzip = compression.toLowerCase(java.util.Locale.ROOT) match {
      case "gzip" => true
      case "none" | "" => false
      case other => throw new IllegalArgumentException(
        s"unsupported compression '$other' (gzip|none)")
    }
    val keyed = df.select(
      renderKey(template, tag, ts, tagDelimiter).as("key"),
      line.cast("string").as("line"))
      .filter(col("line").isNotNull)
    keyed.foreachPartition { (rows: Iterator[Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      final class Part(var out: java.io.OutputStream, var bytes: Long, var roll: Int)
      val open = scala.collection.mutable.HashMap.empty[String, Part]
      val baseCanonical = new File(baseDir).getCanonicalPath
      def newStream(key: String, roll: Int): java.io.OutputStream = {
        val suffix = if (gzip) ".gz" else ""
        val f = new File(baseDir, key.stripPrefix("/") + s"/part-$pid-$roll$suffix")
        // tags are remote-controlled input and flow into the key via
        // $TAG: a '..' segment must not escape the destination root
        if (!f.getCanonicalPath.startsWith(baseCanonical + File.separator))
          throw new IllegalArgumentException(
            s"object key '$key' escapes the sink root")
        f.getParentFile.mkdirs()
        val base = new BufferedOutputStream(new FileOutputStream(f))
        if (gzip) new java.util.zip.GZIPOutputStream(base) else base
      }
      try {
        rows.foreach { r =>
          val key = r.getAs[String]("key")
          val bytes = (r.getAs[String]("line") + "\n").getBytes(StandardCharsets.UTF_8)
          val p = open.getOrElseUpdate(key, new Part(newStream(key, 0), 0L, 0))
          if (p.bytes > 0 && p.bytes + bytes.length > maxBytes) {
            p.out.close()
            p.roll += 1
            p.out = newStream(key, p.roll)
            p.bytes = 0L
          }
          p.out.write(bytes)
          p.bytes += bytes.length
        }
      } finally open.values.foreach(p => p.out.close())
    }
  }
}
