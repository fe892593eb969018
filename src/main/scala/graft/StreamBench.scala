package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Stateful

/** Sustained stateful-streaming throughput — the spans/s parity row
  * BASELINE.md promises against the reference's sampling benchmark
  * (`/root/reference/benchmarks/flb-bench-processor_sampling.c:10-11`,
  * documented invocation `--mode probabilistic --iterations 20000
  * --spans-per-trace 20 --trace-cardinality 4096`; the reference prints
  * its spans/s at run time — no published figure exists, so this main
  * produces OUR side of the row with the workload shape mirrored
  * exactly: 20 000 traces × 20 spans, 4 096-value key cardinality,
  * ~2% error traces).
  *
  * Two modes, like the reference:
  *   - probabilistic: stateless per-trace hash decision
  *     ([[graft.ops.Sampling.probabilistic]]) over the micro-batch
  *     engine — measures engine + codegen filter floor;
  *   - tail: whole-trace buffering with quiet-period decisions
  *     ([[Stateful.tailSample]], ProcessingTimeTimeout span registry) —
  *     measures the stateful path: state store writes per span,
  *     timeout sweeps, group iteration.
  *
  * spans/s = spans fed / wall-clock from first feed to sink-complete
  * (tail mode includes the decision-wait drain — the reference's
  * elapsed likewise covers its reconcile sweeps). Unlike the replay
  * CORRECTNESS gates (4 shuffle partitions, deterministic chunk feeds),
  * this feeds big chunks at full parallelism: throughput is the metric,
  * not hash-replayability.
  *
  * Prints ONE JSON line: {"metric":"stream_spans_per_sec", ...}.
  */
object StreamBench {

  private final val Traces = 20000
  private final val SpansPerTrace = 20
  private final val Cardinality = 4096

  /** Deterministic pseudo-random span stream (reference seeds its RNG;
    * we mix the ids so reruns measure the same workload).
    */
  private def mkSpans(): IndexedSeq[Stateful.Span] = {
    def mix(x: Long): Long = {
      var h = x * 0x9E3779B97F4A7C15L
      h ^= h >>> 32; h *= 0xBF58476D1CE4E5B9L; h ^= h >>> 29
      h & Long.MaxValue
    }
    (0 until Traces).flatMap { t =>
      val key = t % Cardinality
      (0 until SpansPerTrace).map { j =>
        val r = mix(t.toLong * 31 + j)
        Stateful.Span(
          traceId = s"t$t-k$key",
          spanId = s"s$t-$j",
          tsSec = 0L,
          durationMs = r % 1000,
          statusCode = if (r % 53 == 0) 500 else 200, // ~2% error spans
          body = "op" + (r % 17))
      }
    }
  }

  private def drainCount(spark: SparkSession, table: String,
                         expected: Long, deadlineMs: Long): Long = {
    val deadline = System.currentTimeMillis + deadlineMs
    var n = spark.table(table).count()
    while (n < expected && System.currentTimeMillis < deadline) {
      Thread.sleep(100)
      n = spark.table(table).count()
    }
    n
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // stateful shuffles: one state store per partition per operator —
      // cpus-many, not 200
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val spans = mkSpans()
    val totalSpans = spans.size.toLong
    val chunks = spans.grouped(20000).toSeq

    // ---- probabilistic mode: stateless trace-hash keep (~25%) --------
    // warmup pass then measured pass, like the reference's warmup loop
    def runProb(name: String): (Double, Long) = {
      val in = MemoryStream[Stateful.Span]
      val pct = 25.0
      val threshold = f"${(pct / 100.0 * 65536).toLong}%04x"
      val sampled = in.toDS()
        .filter(substring(md5(col("traceId")), 1, 4) < lit(threshold))
      val q = sampled.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(25)).start()
      val t0 = System.nanoTime()
      chunks.foreach(in.addData(_))
      q.processAllAvailable()
      val elapsed = (System.nanoTime() - t0) / 1e9
      q.stop()
      val kept = spark.table(name).count()
      spark.catalog.dropTempView(name)
      (elapsed, kept)
    }

    // ---- tail mode: whole-trace registry + quiet-period decision -----
    def runTail(name: String): (Double, Long) = {
      val in = MemoryStream[Stateful.Span]
      val policy = Stateful.TailPolicy(maxLatencyMs = 995,
        errorStatusMin = 500)
      val q = Stateful.tailSample(spark, in.toDS(), policy,
          decisionWaitMs = 500)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(25)).start()
      // expected kept spans (batch-side truth for the drain target)
      val byTrace = spans.groupBy(_.traceId)
      val expected = byTrace.valuesIterator
        .filter(g => policy.keep(g.toSeq)).map(_.size.toLong).sum
      val t0 = System.nanoTime()
      chunks.foreach(in.addData(_))
      val got = drainCount(spark, name, expected, deadlineMs = 300000)
      val elapsed = (System.nanoTime() - t0) / 1e9
      q.stop()
      spark.catalog.dropTempView(name)
      require(got == expected,
        s"tail drain incomplete: $got of $expected kept spans")
      (elapsed, got)
    }

    // warmup (cold JVM pays class loading + codegen, exactly what the
    // reference's warmup_iterations exist for), then measure
    runProb("warm_prob"); runTail("warm_tail")
    val (probSec, probKept) = runProb("bench_prob")
    val (tailSec, tailKept) = runTail("bench_tail")

    // tail mode again on the RocksDB state-store provider — the
    // production config for unbounded trace cardinality; the delta vs
    // the default in-memory provider is the price of off-heap
    // SST-backed state at this span rate
    val PROV = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(PROV, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val (tailRocksSec, tailRocksKept) =
      try { runTail("warm_tail_rocks"); runTail("bench_tail_rocks") }
      finally spark.conf.unset(PROV)
    require(tailRocksKept == tailKept,
      s"provider changed the result: $tailRocksKept vs $tailKept")

    val probRate = (totalSpans / probSec).toLong
    val tailRate = (totalSpans / tailSec).toLong
    val tailRocksRate = (totalSpans / tailRocksSec).toLong
    println(
      s"""{"metric":"stream_spans_per_sec","unit":"spans/sec",""" +
      s""""traces":$Traces,"spans_per_trace":$SpansPerTrace,""" +
      s""""cardinality":$Cardinality,"total_spans":$totalSpans,""" +
      s""""probabilistic":{"spans_per_sec":$probRate,"elapsed_sec":${f"$probSec%.3f"},"kept":$probKept},""" +
      s""""tail":{"spans_per_sec":$tailRate,"elapsed_sec":${f"$tailSec%.3f"},"kept":$tailKept},""" +
      s""""tail_rocksdb":{"spans_per_sec":$tailRocksRate,"elapsed_sec":${f"$tailRocksSec%.3f"},"kept":$tailRocksKept}}""")
    spark.stop()
  }
}
