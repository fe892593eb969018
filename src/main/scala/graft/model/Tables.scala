package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md) plus the
  * canonical "log event" view of the `events` table.
  *
  * Data model (SURVEY.md §1): the reference's log event is
  * `[[timestamp, metadata-map], body-map]` (fluent-bit
  * include/fluent-bit/flb_log_event.h:29-34). Spark mapping: a DataFrame
  * with `tag STRING, ts TIMESTAMP, meta MAP<STRING,STRING>` plus promoted
  * body columns and a JSON residue column (`props`).
  */
object Tables {

  /** The `events` table ships TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; read nanos as Long and derive typed columns. Exact parity
    * with DuckDB via `epoch_ns(ts)`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) file
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_sec", expr("ts_ns div 1000000000").cast("long"))
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ => // plain micros timestamp (e.g. re-exported scale-up data);
        // NTZ files (DuckDB export) re-anchor in the session zone (UTC)
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
          .withColumn("ts_sec", expr("ts_ns div 1000000000").cast("long"))
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Spread expression-heavy map work across the session's shuffle
    * parallelism when the upstream scan is split-starved (guide §2.5
    * "input skew: one unsplittable file — repartition immediately after
    * the read"). A single-row-group parquet file plans as ONE task, so
    * every per-row expression downstream (gram explode, k-way minhash,
    * digest derivation) runs single-threaded no matter how many cores
    * the session has — measured 6.6 s of an 7.7 s x_fuzzy_join run in
    * one task at sf0.1. The repartition hashes on `key` with an EXPLICIT
    * partition count (user-specified counts are exempt from AQE
    * coalescing, which would otherwise fold the small exchange right
    * back to one partition). Scale-adaptive by construction: when the
    * scan already has at least a quarter of the session parallelism
    * (any real multi-file table at production scale), this is the
    * identity — no extra exchange ever reaches a 100 TB plan.
    */
  def fanOut(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    // streaming inputs have no .rdd and their micro-batch sources set
    // their own partitioning — the split-starvation question is a batch
    // scan concern only
    if (df.isStreaming) return df
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions * 4 < target) df.repartition(target, key)
    else df
  }

  // NOTE (r16): a row-hash fanOut variant for the OTLP body encoders
  // was tried and REVERTED — their input rows are wide (attr maps,
  // span-event arrays), so the extra exchange's serialization cost
  // exceeded the single-task map work it parallelized (f_otlp_traces
  // +90% measured). fanOut pays only where the pre-exchange rows are
  // narrow and the downstream per-row work is expensive (gram/shingle/
  // token explodes, digest loops).

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Log-event view of `events`: tag = "app.<event_type>", event-time ts,
    * metadata map, body fields + JSON residue. This is the stream the
    * FluentQL frontend binds `STREAM:events` / `TAG:'...'` to.
    */
  def logEvents(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("tag", concat(lit("app."), col("event_type")))
      .withColumn("meta", map(lit("source"), lit("events"), lit("type"), col("event_type")))
}
