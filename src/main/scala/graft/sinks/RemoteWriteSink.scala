package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.parse.PromRemoteWrite
import graft.parse.PromRemoteWrite.{RwLabel, RwSample, RwSeries}

/** Prometheus remote-write delivery — the push half of the reference's
  * `plugins/out_prometheus_remote_write/remote_write.c`: the metrics
  * frame serializes into snappy-compressed `WriteRequest` protobuf
  * bodies (remote_write.c:141-186 hands cmetrics contexts to
  * `cmt_encode_prometheus_remote_write` and posts them with
  * `Content-Encoding: snappy`), inverse-paired with the ingest side's
  * [[graft.parse.PromRemoteWrite.decodeBodies]].
  *
  * Wire headers per the public remote-write 1.0 spec (and
  * remote_write.c:204-210): `Content-Type: application/x-protobuf`,
  * `Content-Encoding: snappy`, `X-Prometheus-Remote-Write-Version:
  * 0.1.0`.
  *
  * Distribution shape (same as [[HttpSink]]/[[ForwardSink]]): each
  * partition runs its own encoder + HTTP client — no driver collect; at
  * 1000 executors that is 1000 concurrent senders, the reference's
  * worker-thread model scaled out.
  */
object RemoteWriteSink {

  /** Group flat (name, labels, value, ts_ms) rows into a WriteRequest of
    * one single-sample TimeSeries each, serialized + snappy-compressed.
    * `__name__` is folded back into the label list, inverting
    * decodeBodies' lift.
    */
  def encodeBatch(rows: Seq[(String, Map[String, String], Double, Long)]): Array[Byte] = {
    val series = rows.map { case (name, labels, value, tsMs) =>
      RwSeries(
        RwLabel("__name__", name) +:
          labels.toSeq.sortBy(_._1).map { case (k, v) => RwLabel(k, v) },
        Seq(RwSample(value, tsMs)))
    }
    PromRemoteWrite.snappyCompress(PromRemoteWrite.encode(series))
  }

  /** Ship a metrics frame (`name` string, `labels` map<string,string>,
    * `value` double, `ts_ms` long — the schema
    * [[graft.parse.PromRemoteWrite.decodeBodies]] emits) as remote-write
    * POSTs of at most `batchSeries` series each, one client per
    * partition. Batch form; call from `foreachBatch` in streaming.
    */
  def write(df: DataFrame, url: String, batchSeries: Int = 500,
            maxRetries: Int = 3, baseMs: Int = 100, capMs: Int = 5000,
            headers: Seq[(String, String)] = Nil): Unit = {
    val frame = df.select(
      col("name").cast("string").as("name"),
      col("labels").cast("map<string,string>").as("labels"),
      col("value").cast("double").as("value"),
      col("ts_ms").cast("long").as("ts_ms"))
    val allHeaders = Seq(
      "Content-Encoding" -> "snappy",
      "X-Prometheus-Remote-Write-Version" -> "0.1.0") ++ headers
    frame.foreachPartition { (rows: Iterator[Row]) =>
      val rnd = new java.util.Random()
      rows.map { r =>
        (r.getAs[String]("name"),
          Option(r.getAs[Map[String, String]]("labels")).getOrElse(Map.empty),
          r.getAs[Double]("value"), r.getAs[Long]("ts_ms"))
      }.grouped(batchSeries).foreach { batch =>
        HttpSink.postWithRetry(url, encodeBatch(batch),
          "application/x-protobuf", allHeaders, maxRetries, baseMs, capMs,
          rnd)
      }
    }
  }
}
