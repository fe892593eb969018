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

  /** CIDR longest-prefix-match enrichment — the real form of the geoip2
    * lookup (`plugins/filter_geoip2/geoip2.c` resolves each record's IP
    * against a prefix-keyed database): match `ip32` (an IPv4 address as
    * an unsigned 32-bit value in a BIGINT) against a rule table of
    * `(net, plen, label)` CIDR blocks, the MOST SPECIFIC (longest
    * prefix) rule winning, unmatched rows keeping NULL.
    *
    * Scale: no trie and no range join — the rule table's DISTINCT
    * prefix lengths (a handful: /8, /16, /24…) drive one broadcast
    * LEFT equi-join each on `(ip32 & mask(plen)) = net`, longest plen
    * first, and a `coalesce` picks the first (most specific) hit. The
    * fact side stays map-only through every join — k broadcast hash
    * probes per row, zero shuffles, zero row expansion (the explode-to-
    * prefixes alternative multiplies the 100 TB side ×k and then needs
    * a per-row max shuffle to undo it). Rules with the same plen must
    * be disjoint (CIDR tables are); masks are plain integer bit math
    * replayable by any engine.
    */
  def cidrJoin(logs: DataFrame, ip32: Column, rules: DataFrame,
               labelCol: String = "label"): DataFrame = {
    val plens = rules.select(col("plen")).distinct()
      .collect().map(_.getLong(0).toInt).sorted.reverse
    require(plens.forall(p => p >= 0 && p <= 32), "plen out of range")
    val base = logs.withColumn("__ip", ip32.cast("long"))
    val joined = plens.foldLeft(base) { (d, p) =>
      val mask = if (p == 0) 0L else (0xFFFFFFFFL << (32 - p)) & 0xFFFFFFFFL
      val r = rules.filter(col("plen") === p.toLong)
        .select(col("net").as(s"__net_$p"),
          col(labelCol).as(s"__label_$p"))
      d.join(broadcast(r),
        d("__ip").bitwiseAND(lit(mask)) === col(s"__net_$p"), "left")
    }
    val labels = plens.map(p => col(s"__label_$p"))
    val matchedLen = plens.foldRight(lit(null).cast("long")) { (p, acc) =>
      when(col(s"__label_$p").isNotNull, lit(p.toLong)).otherwise(acc)
    }
    joined
      .withColumn(labelCol, coalesce(labels: _*))
      .withColumn("matched_plen", matchedLen)
      .drop("__ip")
      .drop(plens.flatMap(p => Seq(s"__net_$p", s"__label_$p")): _*)
  }
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
