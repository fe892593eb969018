package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment joins (SURVEY §2.3: kubernetes, geoip2, ecs, aws,
  * checklist). The reference does per-record hash/cache lookups against a
  * small metadata store (e.g. `plugins/filter_kubernetes/kubernetes.c:646`
  * with a TTL cache); the Spark-native equivalent is a **broadcast left
  * join** — the dimension fits in memory (pod metadata, geo db, checklist
  * file), so no shuffle of the 100 TB fact side ever happens.
  */
object Enrich {

  /** kubernetes/ecs/geoip2-style metadata join: left-join `meta` (small,
    * broadcast) onto the log flow, keeping every log record.
    */
  def metadataJoin(logs: DataFrame, meta: DataFrame, keys: Seq[String],
                   select: Seq[(String, String)]): DataFrame = {
    val enriched = logs.join(broadcast(meta), keys, "left")
    select.foldLeft(enriched) { case (d, (from, to)) =>
      d.withColumn(to, col(from))
    }
  }

  /** filter_aws/sysinfo-style static enrichment: constant columns from an
    * environment snapshot (`plugins/filter_aws/aws.c:956`).
    */
  def staticFields(logs: DataFrame, fields: Seq[(String, Column)]): DataFrame =
    fields.foldLeft(logs) { case (d, (k, v)) => d.withColumn(k, v) }
}

/** filter_checklist (reference `plugins/filter_checklist/checklist.c:416`):
  * load a file of values into a hash table; annotate records whose key
  * matches. Spark: broadcast semi-join → `when(...)` annotation, or an
  * `isin` literal fold for tiny lists (constant-folded by Catalyst).
  */
object Checklist {
  /** Annotate: set `outCol = flagValue` when `key` appears in `list`. */
  def annotate(df: DataFrame, key: Column, list: DataFrame, listCol: String,
               outCol: String, flagValue: Column): DataFrame = {
    val marks = broadcast(list.select(col(listCol).as("__ck_key"))
      .distinct().withColumn("__ck_hit", lit(true)))
    df.join(marks, key === col("__ck_key"), "left")
      .withColumn(outCol, when(col("__ck_hit"), flagValue).otherwise(lit(null)))
      .drop("__ck_key", "__ck_hit")
  }

  def annotateLiteral(df: DataFrame, key: Column, values: Seq[Any],
                      outCol: String, flagValue: Column): DataFrame =
    df.withColumn(outCol, when(key.isin(values: _*), flagValue).otherwise(lit(null)))
}
