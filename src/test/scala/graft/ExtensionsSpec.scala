package graft

import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions=graft.GraftExtensions` SQL surface: every
  * registered native expression must be callable from pure SQL and
  * agree with its DataFrame wrapper.
  */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("scalar expressions resolve and compute from pure SQL") {
    val r = spark.sql(
      """SELECT word_shingles('a b c', 2) AS sh,
                nfc_normalize('café') AS nfc,
                mysql_unquote('"hi"') AS mq,
                vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
                byte_dot(X'0102', X'0304') AS bdot,
                media_header(X'89504E470D0A1A0A0000000D494844520000000100000002') AS mh
      """).collect().head
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    assert(r.getString(1) == "café") // combining mark precomposed
    assert(r.getString(2) == "hi")
    assert(r.getDouble(3) == 11.0)
    assert(r.getLong(4) == 1L * 3 + 2 * 4)
    val mh = r.getStruct(5)
    assert(mh.getString(0).toLowerCase.contains("png"), mh.toString)
    assert(mh.getInt(1) == 1 && mh.getInt(2) == 2)
    // hll_bucket_rank: SQL surface equals the kernel, both input types
    val hll = spark.sql(
      """SELECT hll_bucket_rank('42', 8) AS s,
                hll_bucket_rank(CAST(42 AS BIGINT), 8) AS l""")
      .collect().head
    assert(hll.getInt(0) == graft.functions.HllBucketRank.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("42"), 8))
    assert(hll.getInt(0) == hll.getInt(1)) // long fast path = string path
    // md5_mod: SQL surface = kernel = the oracle's hex-prefix formula
    val mm = spark.sql(
      """SELECT md5_mod('42', 8) AS s, md5_mod(CAST(42 AS BIGINT), 8) AS l,
                ('0x' || substr(md5('42'), 1, 8)) AS hexs""")
      .collect().head
    assert(mm.getLong(0) == mm.getLong(1))
    assert(mm.getLong(0) ==
      java.lang.Long.parseLong(mm.getString(2).drop(2), 16) % 8)
    // md5_salt_mod: salted kernel = the Column md5(concat(key, salt))
    // chain it replaced (bloom probe bits), long fast path = string path
    val ms = spark.sql(
      """SELECT md5_salt_mod('42', '#2', 262144) AS s,
                md5_salt_mod(CAST(42 AS BIGINT), '#2', 262144) AS l,
                ('0x' || substr(md5(concat('42', '#2')), 1, 8)) AS hexs"""
    ).collect().head
    assert(ms.getLong(0) == ms.getLong(1))
    assert(ms.getLong(0) ==
      java.lang.Long.parseLong(ms.getString(2).drop(2), 16) % 262144)
  }

  test("warc_scan and gzip_compress compose in SQL") {
    val n = spark.sql(
      """SELECT size(warc_scan(gzip_compress(encode(
           'WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n',
           'UTF-8')))) AS n""").collect().head.getInt(0)
    assert(n == 1)
  }

  test("es_bulk_scan and split_json_values resolve from SQL") {
    val r = spark.sql(
      """SELECT size(es_bulk_scan('{"index":{}}\n{"a":1}')) AS es,
                size(split_json_values('{"a":1}{"b":2}')) AS sj""")
      .collect().head
    assert(r.getInt(0) == 1 && r.getInt(1) == 2)
  }

  test("arity errors are named, not MatchErrors") {
    val e = intercept[Exception](spark.sql("SELECT nfc_normalize('a','b')"))
    assert(e.getMessage.contains("nfc_normalize"))
  }
}
