package graft.obs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryProgress

/** The engine's own pipeline metrics as a first-class metrics frame —
  * the analog of the reference's `in_fluentbit_metrics` input
  * (`/root/reference/plugins/in_fluentbit_metrics/metrics.c`: the agent
  * re-injects its internal cmetrics contexts as a metrics event stream;
  * counters defined in `src/flb_metrics.c` — records/bytes in, proc
  * records/bytes out, retries, errors). The Spark-native signal is
  * [[StreamingQueryProgress]]: each micro-batch progress snapshot
  * flattens to long-format cmetrics-shaped rows
  * `(name, type, labels MAP, ts_ms, batch_id, value)` — the same shape
  * the gated metrics operators consume (`p_metrics_selector` prefix
  * selection, `p_labels` rewrites, `p_cumulative_to_delta` inversion),
  * so the engine can run its OWN telemetry through its OWN pipeline,
  * exactly the reference's loop.
  *
  * Counter semantics follow cmetrics: `*_total` series are CUMULATIVE
  * across batches (accumulated here per query/source over the progress
  * sequence, which Spark hands over batch-ordered), so
  * `CumulativeToDelta` recovers the per-batch reading — spec'd in
  * Round15Spec. Gauges are point-in-time. `batch_id` rides along as the
  * engine's micro-batch clock (deterministic tiebreak when two batches
  * land in one wall-clock millisecond).
  */
object SelfTelemetry {

  final case class MetricRow(name: String, mtype: String,
                             labels: Map[String, String], ts_ms: Long,
                             batch_id: Long, value: Double)

  /** Flatten a batch-ordered progress sequence (one query's
    * `recentProgress`, or several queries' concatenated) to metric rows.
    */
  def progressRows(spark: SparkSession,
                   progresses: Seq[StreamingQueryProgress]): DataFrame = {
    import spark.implicits._
    // cumulative counter state per (query, series) — cmetrics counters
    // are monotone totals, not per-interval readings
    val inTotals = scala.collection.mutable.Map[(String, String), Double]()
    val outTotals = scala.collection.mutable.Map[String, Double]()
    val rows = Vector.newBuilder[MetricRow]
    progresses.foreach { p =>
      val q = Option(p.name).getOrElse(p.id.toString)
      val ts = java.time.Instant.parse(p.timestamp).toEpochMilli
      val base = Map("query" -> q)
      def gauge(name: String, v: Double, extra: (String, String)*): Unit =
        if (!v.isNaN && !v.isInfinite)
          rows += MetricRow(name, "gauge", base ++ extra, ts, p.batchId, v)
      // per-source input counters (fluentbit_input_records_total shape)
      p.sources.zipWithIndex.foreach { case (src, i) =>
        if (src.numInputRows >= 0) {
          val key = (q, i.toString)
          val tot = inTotals.getOrElse(key, 0.0) + src.numInputRows
          inTotals(key) = tot
          rows += MetricRow("graft_input_records_total", "counter",
            base + ("source" -> i.toString), ts, p.batchId, tot)
        }
        gauge("graft_input_rows_per_sec", src.inputRowsPerSecond,
          "source" -> i.toString)
      }
      // sink output counter (fluentbit_output_proc_records_total shape);
      // -1 means the sink does not report — skip, never count it
      if (p.sink != null && p.sink.numOutputRows >= 0) {
        val tot = outTotals.getOrElse(q, 0.0) + p.sink.numOutputRows
        outTotals(q) = tot
        rows += MetricRow("graft_output_records_total", "counter",
          base, ts, p.batchId, tot)
      }
      gauge("graft_processed_rows_per_sec", p.processedRowsPerSecond)
      // per-stage batch durations (triggerExecution, addBatch, ...)
      p.durationMs.forEach { (stage, ms) =>
        gauge("graft_batch_duration_ms", ms.toDouble, "stage" -> stage)
      }
      // stateful-operator footprint — the state-store scale signal
      p.stateOperators.zipWithIndex.foreach { case (op, i) =>
        val opLabel = "operator" ->
          (if (op.operatorName != null && op.operatorName.nonEmpty)
             op.operatorName else i.toString)
        gauge("graft_state_rows", op.numRowsTotal.toDouble, opLabel)
        gauge("graft_state_rows_updated", op.numRowsUpdated.toDouble, opLabel)
        gauge("graft_state_memory_bytes", op.memoryUsedBytes.toDouble, opLabel)
      }
    }
    rows.result().toDF()
  }

  /** Live snapshot over every active query in the session — the
    * production entry point (call from a monitoring micro-batch or an
    * ad-hoc cell; each query's recentProgress is already batch-ordered).
    */
  def snapshot(spark: SparkSession): DataFrame =
    progressRows(spark,
      spark.streams.active.toSeq.flatMap(_.recentProgress.toSeq))
}
