package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.shim

import graft.functions.{CidrLpm, CidrModel}

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
    // ONE driver action reads the distinct prefix lengths AND checks the
    // disjointness contract (duplicate (plen, net) rules would silently
    // fan out matching fact rows). Defensive cast: an INT/SMALLINT plen
    // column must not ClassCastException at collect.
    val plenAgg = rules
      .groupBy(col("plen").cast("long").as("__p"))
      .agg(count(lit(1)).as("__n"), countDistinct(col("net")).as("__nd"))
      .collect()
    plenAgg.foreach(r => require(r.getLong(1) == r.getLong(2),
      s"rules at plen=${r.getLong(0)} repeat a net — same-length CIDR " +
        "rules must be disjoint or matching fact rows duplicate"))
    val plens = plenAgg.map(_.getLong(0).toInt).sorted.reverse
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

  /** IPv6 longest-prefix-match enrichment — the 128-bit twin of
    * [[cidrJoin]], matching `filter_geoip2`'s IPv6 MaxMind capability
    * (reference `plugins/filter_geoip2/geoip2.c:380` hands any address
    * family to libmaxminddb's binary prefix tree). A 128-bit address is
    * TWO BIGINTs `(hi, lo)` — big-endian halves of the address — and a
    * /p mask is plain two-long bit math, replayable by any engine:
    *
    *   p ≤ 64 :  mask_hi = -1 << (64-p)  (p=0 ⇒ 0), mask_lo = 0
    *   p > 64 :  mask_hi = -1 (all bits), mask_lo = -1 << (128-p)
    *
    * (`-1 << s` is the signed two's-complement value with the top
    * `64-s` bits set — the identical bit pattern in Spark and DuckDB,
    * so the equi-join keys hash-match.)
    *
    * Same scale shape as the IPv4 form: one broadcast LEFT equi-join
    * per DISTINCT prefix length on the pre-masked `(net_hi, net_lo)`
    * pair, longest plen first, `coalesce` picks the most specific hit,
    * the fact side stays map-only with zero shuffles and zero row
    * expansion. Rules carry `(net_hi, net_lo, plen, label)` with nets
    * already masked; same-plen rules must be disjoint (enforced).
    */
  def cidrJoin6(logs: DataFrame, ipHi: Column, ipLo: Column,
                rules: DataFrame, labelCol: String = "label"): DataFrame = {
    val plenAgg = rules
      .groupBy(col("plen").cast("long").as("__p"))
      .agg(count(lit(1)).as("__n"),
        countDistinct(col("net_hi"), col("net_lo")).as("__nd"))
      .collect()
    plenAgg.foreach(r => require(r.getLong(1) == r.getLong(2),
      s"rules at plen=${r.getLong(0)} repeat a net — same-length CIDR " +
        "rules must be disjoint or matching fact rows duplicate"))
    val plens = plenAgg.map(_.getLong(0).toInt).sorted.reverse
    require(plens.forall(p => p >= 0 && p <= 128), "plen out of range")
    def maskHi(p: Int): Long =
      if (p == 0) 0L else if (p >= 64) -1L else -1L << (64 - p)
    def maskLo(p: Int): Long =
      if (p <= 64) 0L else -1L << (128 - p)
    val base = logs
      .withColumn("__iph", ipHi.cast("long"))
      .withColumn("__ipl", ipLo.cast("long"))
    val joined = plens.foldLeft(base) { (d, p) =>
      val r = rules.filter(col("plen") === p.toLong)
        .select(col("net_hi").as(s"__nh_$p"), col("net_lo").as(s"__nl_$p"),
          col(labelCol).as(s"__label_$p"))
      d.join(broadcast(r),
        d("__iph").bitwiseAND(lit(maskHi(p))) === col(s"__nh_$p") &&
          d("__ipl").bitwiseAND(lit(maskLo(p))) === col(s"__nl_$p"), "left")
    }
    val labels = plens.map(p => col(s"__label_$p"))
    val matchedLen = plens.foldRight(lit(null).cast("long")) { (p, acc) =>
      when(col(s"__label_$p").isNotNull, lit(p.toLong)).otherwise(acc)
    }
    joined
      .withColumn(labelCol, coalesce(labels: _*))
      .withColumn("matched_plen", matchedLen)
      .drop("__iph", "__ipl")
      .drop(plens.flatMap(p => Seq(s"__nh_$p", s"__nl_$p", s"__label_$p")): _*)
  }

  /** Longest-prefix-match enrichment as ONE map-only projection — the
    * fast path of [[cidrJoin]] when the rule table is driver-resident
    * model state (a CIDR/geo database is a static dimension; MaxMind-
    * class ≈ millions of rules ≈ tens of MB as long arrays). One
    * bounded collect builds a [[graft.functions.CidrModel]] (per-plen
    * sorted nets, binary search, longest first) carried as a plan
    * reference object; label and `matched_plen` derive from the matched
    * rule index via literal-array `get`, so the whole enrichment is
    * zero joins, zero shuffles, zero row expansion — k chained
    * broadcast probes and their per-join output row copies collapse
    * into one codegen'd lookup. Bit-identical output to [[cidrJoin]]
    * (same disjointness contract, enforced at model build).
    */
  def cidrLookup(logs: DataFrame, ip32: Column, rules: DataFrame,
                 labelCol: String = "label"): DataFrame = {
    val rows = rules.select(col("net").cast("long"),
      col("plen").cast("long"), col(labelCol).cast("string")).collect()
    val model = CidrModel.build(
      rows.map(r => (r.getLong(0), 0L, r.getLong(1).toInt)), 32)
    lpmSelect(logs, ip32.cast("long"), lit(0L), model,
      rows.map(_.getString(2)), rows.map(_.getLong(1)), labelCol)
  }

  /** IPv6 twin of [[cidrLookup]]: two-long addresses and `/p` masks with
    * the identical bit math as [[cidrJoin6]], one codegen'd binary-
    * search lookup per row instead of one broadcast join per prefix
    * length. Unsigned two-long compares make addresses with the top bit
    * set order correctly.
    */
  def cidrLookup6(logs: DataFrame, ipHi: Column, ipLo: Column,
                  rules: DataFrame, labelCol: String = "label"): DataFrame = {
    val rows = rules.select(col("net_hi").cast("long"),
      col("net_lo").cast("long"), col("plen").cast("long"),
      col(labelCol).cast("string")).collect()
    val model = CidrModel.build(
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt)), 128)
    lpmSelect(logs, ipHi.cast("long"), ipLo.cast("long"), model,
      rows.map(_.getString(3)), rows.map(_.getLong(2)), labelCol)
  }

  private def lpmSelect(logs: DataFrame, hi: Column, lo: Column,
                        model: CidrModel, labels: Array[String],
                        rulePlens: Array[Long], labelCol: String): DataFrame = {
    // get() is 0-based and yields NULL for -1 (no match) and for a NULL
    // index (null address) — exactly the left-join-no-hit semantics.
    val idx = shim.column(
      CidrLpm(shim.expression(hi), shim.expression(lo), model))
    logs
      .withColumn("__lpm", idx)
      .withColumn(labelCol, get(lit(labels), col("__lpm")))
      .withColumn("matched_plen", get(lit(rulePlens), col("__lpm")))
      .drop("__lpm")
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
