package graft.model

import org.apache.spark.sql.DataFrame

/** Physical-layout helpers for the 100 TB path (SURVEY §1.4/§4 —
  * "co-locate joins via bucketing, partition by tag/date").
  *
  * A pipeline that repeatedly joins on the same key (doc_id for dedup
  * signatures, trace_id for span assembly, container key for enrichment)
  * should persist both sides bucketed on that key: Spark then plans the
  * join with NO exchange on either side — at 100 TB that is the
  * difference between a network-wide shuffle and a purely local join.
  * Partitioning by low-cardinality routing columns (tag, date) gives
  * scan-time partition pruning on top.
  */
object Layout {

  /** Persist as a bucketed (+ optionally partitioned) table. Spark's
    * bucketing is hash(key) mod n — stable across writers, so any two
    * tables bucketed (same key, same n) co-locate.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketKey: String, nBuckets: Int,
                    partitionBy: Seq[String] = Nil): Unit = {
    var w = df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, bucketKey)
      .sortBy(bucketKey)
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.saveAsTable(table)
  }
}
