package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.Sketches

/** Bottom-k hash-sample quantile sketch: boundedness, mergeability
  * (the property that makes it a sketch), determinism, and rank
  * accuracy on a known distribution.
  */
class KmvQuantileSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def mkDf(n: Int) =
    spark.range(n.toLong).select(col("id"), (col("id") % 1000).as("v"))

  test("sample is bounded at k and deterministic across evaluations") {
    val df = mkDf(50000)
    val s1 = Sketches.kmvQuantileSample(df, col("id"), col("v"), k = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val s2 = Sketches.kmvQuantileSample(df, col("id"), col("v"), k = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(s1.size == 256)
    assert(s1.sorted == s2.sorted)
  }

  test("bottom-k of a union == bottom-k of the halves' bottom-k's (mergeable)") {
    val a = mkDf(20000).filter(col("id") % 2 === 0)
    val b = mkDf(20000).filter(col("id") % 2 === 1)
    val whole = Sketches.kmvQuantileSample(mkDf(20000), col("id"), col("v"), 128)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // merge = smallest 128 (h, v) pairs of the halves' 128-row samples —
    // no re-hash, no second look at the data
    val merged = (Sketches.kmvQuantileSample(a, col("id"), col("v"), 128)
        .collect() ++
        Sketches.kmvQuantileSample(b, col("id"), col("v"), 128).collect())
      .map(r => (r.getLong(0), r.getLong(1))).sorted.take(128).toSeq
    assert(merged == whole)
  }

  test("estimates sit within exact ±5-centile bounds on a skewed distribution") {
    // squares: heavily right-skewed, unbounded-domain shape
    val df = spark.range(100000).select(col("id"), (col("id") * col("id") % 999983L).as("v"))
    val est = Sketches.kmvQuantiles(df, col("id"), col("v"), k = 4096,
        qCentis = Seq(50, 90, 99))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val exact = df.select(col("v")).collect().map(_.getLong(0)).sorted
    val n = exact.length
    for ((q, e) <- est) {
      val lo = exact(math.max(0, (n * (q - 5) / 100).toInt - 1))
      val hi = exact(math.min(n - 1, (n * (q + 5) / 100).toInt))
      assert(e >= lo && e <= hi, s"q=$q est=$e outside [$lo, $hi]")
    }
    assert(est.keySet == Set(50L, 90L, 99L))
  }

  test("streaming twin: bottom-k of the sink equals the batch sample, any feed order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rnd = new scala.util.Random(1303)
    val data = (0 until 5000).map(i =>
      graft.streaming.Stateful.KmvRow(
        (rnd.nextInt(1 << 30) % 16), rnd.nextInt(1 << 30).toLong,
        rnd.nextInt(1000).toLong))
    // adversarial feed order: DESCENDING h, so every later row evicts —
    // maximum admission churn
    val feedOrder = data.sortBy(-_.h)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[graft.streaming.Stateful.KmvRow]
    val q = graft.streaming.Stateful.kmvSampleStream(spark, in.toDS(), k = 64)
      .writeStream.format("memory").queryName("kmv_stream_spec")
      .outputMode("append").start()
    try {
      feedOrder.grouped(1000).foreach(c => in.addData(c))
      q.processAllAvailable()
    } finally q.stop()
    val sink = spark.table("kmv_stream_spec")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val batch = data.map(r => (r.h, r.v)).sorted.take(64)
    assert(sink.sorted.take(64).toSeq == batch)
    assert(sink.length >= 64 && sink.length < data.length,
      s"sink ${sink.length} should show admissions+evictions, not everything")
  }

  test("grouped == per-group ungrouped on every group") {
    val df = spark.range(30000).select(col("id"),
      (col("id") % 3).cast("string").as("g"),
      (col("id") * 7919 % 99991).as("v"))
    val grouped = Sketches.kmvGroupedQuantiles(df, col("g"), col("id"),
        col("v"), k = 512)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    for (g <- Seq("0", "1", "2")) {
      val single = Sketches.kmvQuantiles(df.filter(col("g") === g),
          col("id"), col("v"), k = 512)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      for ((q, nv) <- single)
        assert(grouped((g, q)) == nv, s"g=$g q=$q")
    }
    assert(grouped.size == 9)
  }

  test("grouped streaming twin: per-group sink bottom-k equals each group's batch sample") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rnd = new scala.util.Random(1305)
    val data = (0 until 6000).map { _ =>
      val h = rnd.nextInt(1 << 30).toLong
      graft.streaming.Stateful.GKmvRow(
        s"g${rnd.nextInt(3)}", (h % 4).toInt, h, rnd.nextInt(1000).toLong)
    }
    val feedOrder = data.sortBy(-_.h) // maximum eviction churn
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[graft.streaming.Stateful.GKmvRow]
    val q = graft.streaming.Stateful
      .kmvGroupedSampleStream(spark, in.toDS(), k = 32)
      .writeStream.format("memory").queryName("gkmv_stream_spec")
      .outputMode("append").start()
    try {
      feedOrder.grouped(1500).foreach(c => in.addData(c))
      q.processAllAvailable()
    } finally q.stop()
    val sink = spark.table("gkmv_stream_spec").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    for (g <- Seq("g0", "g1", "g2")) {
      val sinkG = sink.filter(_._1 == g).map(r => (r._2, r._3)).sorted.take(32).toSeq
      val batchG = data.filter(_.g == g).map(r => (r.h, r.v)).sorted.take(32)
      assert(sinkG == batchG, s"group $g")
    }
  }

  test("n_sample caps at the input size when the input is smaller than k") {
    val df = mkDf(100)
    val out = Sketches.kmvQuantiles(df, col("id"), col("v"), k = 4096)
      .collect()
    assert(out.forall(_.getLong(1) == 100L))
  }
}
