package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming._
import graft.streaming.Multiline.{Assembled, Line, Rule}
import graft.streaming.Stateful._

/** Streaming stateful ops driven by MemoryStream — the exact analogue of
  * the reference's library-mode runtime tests (flb_lib_push → out_lib
  * callback, SURVEY §3.3).
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def runToMemory[T](ds: org.apache.spark.sql.Dataset[T], name: String)(
      feed: => Unit): Unit = {
    val q = ds.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try { feed; q.processAllAvailable() } finally q.stop()
  }

  test("multiline stream assembles stack traces; new start flushes previous") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Line]
    val out = Multiline.assembleStream(spark, in.toDS(), Multiline.Modes.java,
      flushMs = 60000)
    runToMemory(out, "ml_out") {
      in.addData(
        Line("pod1", 1, "ERROR boom"),
        Line("pod1", 2, "  at a.b.C(1)"),
        Line("pod1", 3, "  at d.e.F(2)"),
        Line("pod1", 4, "INFO next record"), // flushes the trace
        Line("pod2", 1, "plain line"),
        Line("pod2", 2, "another start")     // flushes "plain line"
      )
    }
    val got = spark.table("ml_out").as[Assembled].collect()
      .map(a => (a.key, a.firstSeq) -> a).toMap
    assert(got(("pod1", 1L)).message == "ERROR boom\n  at a.b.C(1)\n  at d.e.F(2)")
    assert(got(("pod1", 1L)).nLines == 3)
    assert(got(("pod2", 1L)).message == "plain line")
    // the still-open groups (INFO next record / another start) remain buffered
    assert(!got.contains(("pod1", 4L)))
  }

  test("multiline stream flushes on processing-time timeout (flush_ms)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Line]
    val out = Multiline.assembleStream(spark, in.toDS(), Multiline.Modes.java,
      flushMs = 300)
    val q = out.writeStream.format("memory").queryName("ml_timeout")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      in.addData(Line("pod1", 1, "ERROR boom"), Line("pod1", 2, "  at x"))
      q.processAllAvailable()
      Thread.sleep(600)
      in.addData(Line("other", 99, "tick")) // drive a batch so timeouts fire
      q.processAllAvailable()
      var tries = 0
      while (spark.table("ml_timeout").isEmpty && tries < 20) {
        Thread.sleep(200); in.addData(Line("other", 100 + tries, "tick"))
        q.processAllAvailable(); tries += 1
      }
    } finally q.stop()
    val got = spark.table("ml_timeout").as[Assembled].collect()
    assert(got.exists(a => a.key == "pod1" && a.nLines == 2), got.mkString(";"))
  }

  test("throttle token bucket: at most rate records per pane per key") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Rec]
    val out = Stateful.throttle(spark, in.toDS(), rate = 2, paneSeconds = 10)
    runToMemory(out, "thr_out") {
      in.addData((1 to 6).map(i => Rec("k1", 100L + i % 5, s"r$i")): _*)
      in.addData(Rec("k1", 115L, "next_pane"), Rec("k2", 100L, "other_key"))
    }
    val got = spark.table("thr_out").as[Rec].collect()
    assert(got.count(r => r.tag == "k1" && r.tsSec < 110) == 2) // capped
    assert(got.exists(_.body == "next_pane")) // new pane refills
    assert(got.exists(_.body == "other_key")) // independent bucket
  }

  test("snapshot buffer flushes history when the trigger record arrives") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Rec]
    val out = Stateful.snapshotFlush(spark, in.toDS(), maxRecords = 10,
      seconds = 100, flushWhen = _.body.contains("ALERT"))
    runToMemory(out, "snap_out") {
      in.addData(Rec("t", 1, "a"), Rec("t", 2, "b"))
      in.addData(Rec("t", 3, "ALERT now"))
    }
    val got = spark.table("snap_out").as[Rec].collect().map(_.body).toSet
    assert(got == Set("a", "b")) // buffered history re-emitted on flush
  }

  test("tail sampling keeps error traces, drops clean ones") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Span]
    val out = Stateful.tailSample(spark, in.toDS(),
      TailPolicy(maxLatencyMs = 1000), decisionWaitMs = 300)
    val q = out.writeStream.format("memory").queryName("tail_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      in.addData(
        Span("trace_err", "s1", 1, 10, 200, "ok span"),
        Span("trace_err", "s2", 2, 20, 503, "error span"),
        Span("trace_ok", "s3", 1, 10, 200, "clean"))
      q.processAllAvailable()
      Thread.sleep(600)
      var tries = 0
      while (spark.table("tail_out").isEmpty && tries < 20) {
        Thread.sleep(200)
        in.addData(Span("tick", s"t$tries", 1, 1, 200, "tick"))
        q.processAllAvailable(); tries += 1
      }
    } finally q.stop()
    val got = spark.table("tail_out").as[Span].collect()
    assert(got.map(_.traceId).toSet == Set("trace_err"))
    assert(got.length == 2) // whole trace, all spans
  }

  test("windowed streaming aggregation with watermark emits closed windows") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "tag", "value")
    val agg = Streams.windowedAgg(df, "ts", "10 seconds", "1 minute", None,
      Seq("tag"), Seq(count(lit(1)).as("n"), sum("value").as("sv")))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      in.addData(
        (t("2024-01-01 00:00:05"), "a", 1.0),
        (t("2024-01-01 00:00:10"), "a", 2.0),
        (t("2024-01-01 00:00:30"), "b", 5.0))
      q.processAllAvailable()
      // advance watermark past the first window so it closes
      in.addData((t("2024-01-01 00:02:30"), "a", 9.0))
      q.processAllAvailable()
      in.addData((t("2024-01-01 00:05:00"), "a", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("win_out")
      .select(col("window.start").cast("string"), col("tag"), col("n"), col("sv"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(rows.contains(("2024-01-01 00:00:00", "a", 2L, 3.0)))
    assert(rows.contains(("2024-01-01 00:00:00", "b", 1L, 5.0)))
  }
}
