package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.ObjectStoreSink

import scala.jdk.CollectionConverters._

/** Key templating + size-based part rolling of the object-store sink
  * (out_s3 semantics on a local-fs stand-in).
  */
class ObjectStoreSinkSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val ts = to_timestamp(lit("2024-01-02 03:04:05"))

  private def render(template: String, tag: String,
                     seq: Option[Int] = None): String =
    Seq(tag).toDF("tag")
      .select(ObjectStoreSink.renderKey(template, col("tag"), ts,
        seqIndex = seq.map(lit(_))).as("k"))
      .as[String].collect()(0)

  test("renderKey: $TAG, $TAG[n], strftime subset") {
    assert(render("/logs/$TAG/%Y/%m/%d/%H/%M/%S", "app.web.us") ==
      "/logs/app.web.us/2024/01/02/03/04/05")
    assert(render("/$TAG[0]/$TAG[2]-$TAG[1].gz", "app.web.us") ==
      "/app/us-web.gz")
  }

  test("renderKey: out-of-bounds tag part and bare $INDEX stay verbatim") {
    // flb_aws_util.c:1166-1171: an unmatched "$TAG[" token is left in
    // the key (with a warning); $INDEX without a sequence likewise
    assert(render("/k/$TAG[5]/x", "a.b") == "/k/$TAG[5]/x")
    assert(render("/k/$INDEX/x", "a.b") == "/k/$INDEX/x")
    assert(render("/k/$INDEX/x", "a.b", seq = Some(7)) == "/k/7/x")
  }

  test("write: templated paths land and parts roll on size") {
    val dir = Files.createTempDirectory("s3sink").toFile.getAbsolutePath
    val df = spark.range(100).select(
      lit("app.web").as("tag"), ts.as("ts"),
      concat(lit("line-"), lpad(col("id").cast("string"), 3, "0")).as("line"))
      .coalesce(1)
    ObjectStoreSink.write(df, dir, "/logs/$TAG/%Y/%m/%d/records",
      col("tag"), col("ts"), col("line"), maxBytes = 200)
    val keyDir = Paths.get(dir, "logs/app.web/2024/01/02/records")
    val parts = Files.list(keyDir).iterator().asScala.toSeq.sortBy(_.toString)
    assert(parts.size > 1, s"expected size-rolled parts, got $parts")
    assert(parts.forall(_.getFileName.toString.startsWith("part-")))
    // every part except the last stayed within one line of the cap
    val sizes = parts.map(Files.size)
    assert(sizes.init.forall(_ <= 200 + "line-000\n".length))
    // all 100 lines survive, none duplicated, order within parts kept
    val lines = parts.flatMap(p => Files.readAllLines(p).asScala)
    assert(lines.sorted == (0 until 100).map(i => f"line-$i%03d"))
  }

  test("write: gzip parts decompress to exactly the uncompressed output") {
    def lines(n: Int) = spark.range(n).select(
      lit("app.gz").as("tag"), ts.as("ts"),
      concat(lit("line-"), lpad(col("id").cast("string"), 3, "0")).as("line"))
      .coalesce(1)
    val plainDir = Files.createTempDirectory("s3plain").toFile.getAbsolutePath
    val gzDir = Files.createTempDirectory("s3gz").toFile.getAbsolutePath
    ObjectStoreSink.write(lines(100), plainDir, "/logs/$TAG/records",
      col("tag"), col("ts"), col("line"), maxBytes = 200)
    ObjectStoreSink.write(lines(100), gzDir, "/logs/$TAG/records",
      col("tag"), col("ts"), col("line"), maxBytes = 200,
      compression = "gzip")
    def partDir(d: String) = Paths.get(d, "logs/app.gz/records")
    val plainParts = Files.list(partDir(plainDir)).iterator().asScala.toSeq
      .sortBy(_.toString)
    val gzParts = Files.list(partDir(gzDir)).iterator().asScala.toSeq
      .sortBy(_.toString)
    // same roll structure: the threshold applies to UNCOMPRESSED bytes
    assert(gzParts.size == plainParts.size && gzParts.size > 1)
    assert(gzParts.forall(_.getFileName.toString.endsWith(".gz")))
    // compressed parts are actually smaller than their raw twins
    assert(gzParts.map(Files.size).sum < plainParts.map(Files.size).sum)
    def gunzip(p: java.nio.file.Path): Array[Byte] = {
      val in = new java.util.zip.GZIPInputStream(Files.newInputStream(p))
      try in.readAllBytes() finally in.close()
    }
    // decompressed concatenation is byte-identical to the plain run
    val plainBytes = plainParts.map(Files.readAllBytes).reduce(_ ++ _)
    val gzBytes = gzParts.map(gunzip).reduce(_ ++ _)
    assert(java.util.Arrays.equals(gzBytes, plainBytes))
  }

  test("write: a tag with '..' cannot escape the sink root") {
    val dir = Files.createTempDirectory("s3esc").toFile.getAbsolutePath
    val df = Seq(("../../escaped", "x")).toDF("tag", "line")
      .withColumn("ts", ts)
    val err = intercept[org.apache.spark.SparkException] {
      ObjectStoreSink.write(df, dir, "/logs/$TAG/records",
        col("tag"), col("ts"), col("line"))
    }
    assert(err.getMessage.contains("escapes the sink root") ||
      Option(err.getCause).exists(_.getMessage.contains("escapes the sink root")))
    assert(!Files.exists(Paths.get(dir).getParent.resolve("escaped")))
  }
}
