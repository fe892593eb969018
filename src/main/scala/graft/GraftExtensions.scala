package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import graft.functions._

/** SQL-surface registration for graft's native Catalyst expressions —
  * `spark.sql("SELECT warc_scan(blob) ...")` works anywhere the library
  * is on the classpath with
  * `spark.sql.extensions=graft.GraftExtensions` (the idiomatic Spark
  * extension hook; nothing session-scoped to manage, executors pick the
  * codegen up for free). The DataFrame wrappers in
  * [[graft.functions.TextFunctions]] / [[graft.functions.WarcFunctions]]
  * remain the typed front door; this makes the same kernels reachable
  * from pure-SQL pipelines and thriftserver users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registry.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  private def one(name: String)(f: Expression => Expression)
      : Seq[Expression] => Expression = {
    case Seq(c) => f(c)
    case args => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${args.size}")
  }

  private def two(name: String)(f: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => f(a, b)
    case args => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${args.size}")
  }

  val registry: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - all word n-grams of text"),
      { args: Seq[Expression] => args match {
          case Seq(c, Literal(n: Int, IntegerType)) => WordShingles(c, n)
          case _ => throw new IllegalArgumentException(
            "word_shingles expects (text, int-literal n)")
        } }),
    (FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(str) - Unicode NFC normalization"),
      one("nfc_normalize")(NfcNormalize)),
    (FunctionIdentifier("unescape_utf8"),
      info("unescape_utf8", "unescape_utf8(str) - escaped_utf8 decoder"),
      one("unescape_utf8")(UnescapeUtf8)),
    (FunctionIdentifier("mysql_unquote"),
      info("mysql_unquote", "mysql_unquote(str) - mysql_quoted decoder"),
      one("mysql_unquote")(MysqlUnquote)),
    (FunctionIdentifier("split_json_values"),
      info("split_json_values",
        "split_json_values(str) - split concatenated top-level JSON values"),
      one("split_json_values")(SplitJsonValues)),
    (FunctionIdentifier("es_bulk_scan"),
      info("es_bulk_scan", "es_bulk_scan(body) - ES _bulk actions"),
      one("es_bulk_scan")(EsBulkScan)),
    (FunctionIdentifier("html_unescape"),
      info("html_unescape",
        "html_unescape(str) - decode HTML entities, malformed-verbatim"),
      one("html_unescape")(HtmlUnescape)),
    (FunctionIdentifier("warc_scan"),
      info("warc_scan", "warc_scan(blob) - WARC/WET records (gzip ok)"),
      one("warc_scan")(WarcScan)),
    (FunctionIdentifier("gzip_compress"),
      info("gzip_compress", "gzip_compress(bin) - RFC 1952 compression"),
      one("gzip_compress")(GzipCompress)),
    (FunctionIdentifier("media_header"),
      info("media_header", "media_header(bin) - magic-byte media sniffing"),
      one("media_header")(MediaHeader)),
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - double-array dot product"),
      two("vec_dot")(DotProduct)),
    (FunctionIdentifier("byte_dot"),
      info("byte_dot", "byte_dot(a, b) - packed-byte integer dot product"),
      two("byte_dot")(ByteDotProduct)),
    (FunctionIdentifier("hll_bucket_rank"),
      info("hll_bucket_rank",
        "hll_bucket_rank(key, p) - HLL bucket*64+rank of md5(key)"),
      { args: Seq[Expression] => args match {
          case Seq(c, Literal(p: Int, IntegerType)) => HllBucketRank(c, p)
          case _ => throw new IllegalArgumentException(
            "hll_bucket_rank expects (key, int-literal p)")
        } }),
    (FunctionIdentifier("md5_mod"),
      info("md5_mod",
        "md5_mod(key, m) - first 4 md5 digest bytes (unsigned) mod m"),
      { args: Seq[Expression] => args match {
          case Seq(c, Literal(m: Int, IntegerType)) => Md5Mod(c, m)
          case _ => throw new IllegalArgumentException(
            "md5_mod expects (key, int-literal m)")
        } }),
    (FunctionIdentifier("md5_salt_mod"),
      info("md5_salt_mod",
        "md5_salt_mod(key, salt, m) - first 4 md5 bytes of " +
          "(CAST(key AS VARCHAR) || salt), unsigned, mod m"),
      { args: Seq[Expression] => args match {
          case Seq(c, Literal(s: org.apache.spark.unsafe.types.UTF8String,
                   StringType), Literal(m: Int, IntegerType)) =>
            Md5SaltMod(c, s.toString, m)
          case _ => throw new IllegalArgumentException(
            "md5_salt_mod expects (key, string-literal salt, int-literal m)")
        } })
  )
}
