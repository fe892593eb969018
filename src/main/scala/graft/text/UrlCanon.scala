package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-URL dedup — the crawl-curation step
  * that collapses scheme/host case, default ports, fragments, tracking
  * parameters, and query-parameter order before provenance dedup (the
  * C4/RefinedWeb pipelines dedup by canonical URL before any content
  * pass; the reference's closest surface is its record_accessor-driven
  * rewrite_tag on URL-bearing fields).
  *
  * Rules (RFC 3986 §6 normalization, the practical subset):
  *   - scheme and host lowercase; fragment dropped;
  *   - default port dropped (http:80, https:443), others kept;
  *   - `utm_*` tracking parameters dropped, survivors sorted bytewise;
  *   - path kept verbatim (dot-segment resolution is out of scope).
  *
  * Everything is a pure string-function Column tree — map-only,
  * whole-stage-codegen, no UDF; the only shuffle in [[dedupByCanonical]]
  * is the canonical-key window that elects the keeper (first doc_id).
  * Assumes absolute http(s) URLs (`scheme://host[:port]/path[?q][#f]`).
  */
object UrlCanon {

  /** doc-level dedup by canonical URL: kept = lowest doc_id of the
    * canonical group; n_variants audits the collapse factor.
    */
  def dedupByCanonical(df: DataFrame, id: Column, url: Column): DataFrame = {
    val base = df.select(id.as("doc_id"), url.as("url"))
      .withColumn("scheme", lower(substring_index(col("url"), "://", 1)))
      .withColumn("rest", expr("substring(url, instr(url, '://') + 3)"))
      .withColumn("rest2", substring_index(col("rest"), "#", 1))
      .withColumn("hostport", substring_index(col("rest2"), "/", 1))
      .withColumn("pathq", expr("substring(rest2, length(hostport) + 1)"))
      .withColumn("host", lower(substring_index(col("hostport"), ":", 1)))
      .withColumn("port",
        when(instr(col("hostport"), ":") > 0,
          expr("substring(hostport, instr(hostport, ':') + 1)"))
          .otherwise(lit("")))
      .withColumn("path", substring_index(col("pathq"), "?", 1))
      .withColumn("q",
        when(instr(col("pathq"), "?") > 0,
          expr("substring(pathq, length(path) + 2)")).otherwise(lit("")))
      .withColumn("params", expr(
        "filter(split(q, '&'), x -> x != '' AND substring(x, 1, 4) != 'utm_')"))
      .withColumn("portpart",
        when(col("port") === "", lit(""))
          .when(col("scheme") === "http" && col("port") === "80", lit(""))
          .when(col("scheme") === "https" && col("port") === "443", lit(""))
          .otherwise(concat(lit(":"), col("port"))))
      .withColumn("qpart",
        when(size(col("params")) === 0, lit(""))
          .otherwise(concat(lit("?"),
            array_join(array_sort(col("params")), "&"))))
      .withColumn("canon", concat(col("scheme"), lit("://"), col("host"),
        col("portpart"), col("path"), col("qpart")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("canon"))
    base.select(col("doc_id"), col("url"), col("canon"))
      .withColumn("kept", col("doc_id") === min(col("doc_id")).over(w))
      .withColumn("n_variants", count(lit(1)).over(w))
  }
}
