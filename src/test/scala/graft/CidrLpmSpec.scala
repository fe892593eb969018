package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CidrModel
import graft.ops.Enrich

/** The r13 LPM rework: `cidrLookup`/`cidrLookup6` (one codegen'd
  * binary-search projection) must be bit-identical to the chained
  * broadcast-left-join forms on any disjoint rule table.
  */
class CidrLpmSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Option[String], Option[Long])] =
    df.select(col("id"), col("label"), col("matched_plen")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

  test("cidrLookup == cidrJoin on a randomized nested IPv4 rule table") {
    val rnd = new scala.util.Random(1301)
    // nested /8 ⊃ /16 ⊃ /24 blocks plus stray rules; disjoint per plen
    val rules = (
      (0 until 12).map(i => ((i * 37L % 256) << 24, 8L, s"r8_$i")) ++
      (0 until 40).map(i => ((i * 641L % 65536) << 16, 16L, s"r16_$i")) ++
      (0 until 90).map(i => ((i * 7129L % 16777216) << 8, 24L, s"r24_$i"))
    ).distinct.toDF("net", "plen", "label")
    val ips = (0 until 4000).map(i =>
      (i.toLong, rnd.nextLong() & 0xFFFFFFFFL)).toDF("id", "ip")
    val viaJoin = canon(Enrich.cidrJoin(ips, col("ip"), rules))
    val viaLpm = canon(Enrich.cidrLookup(ips, col("ip"), rules))
    assert(viaLpm == viaJoin)
    assert(viaJoin.exists(_._2.isDefined) && viaJoin.exists(_._2.isEmpty),
      "test vector must exercise both matched and unmatched rows")
  }

  test("cidrLookup6 == cidrJoin6 across edge prefix lengths and sign bits") {
    val rnd = new scala.util.Random(1302)
    def mHi(p: Int): Long = if (p == 0) 0L else if (p >= 64) -1L else -1L << (64 - p)
    def mLo(p: Int): Long = if (p <= 64) 0L else -1L << (128 - p)
    // rules at the mask edge cases, nets drawn so negative (top-bit-set)
    // halves exercise the unsigned compares
    val plens = Seq(1, 63, 64, 65, 127, 128)
    val base = (0 until 60).map { i =>
      val p = plens(i % plens.length)
      val h = rnd.nextLong(); val l = rnd.nextLong()
      (h & mHi(p), l & mLo(p), p.toLong, s"r${p}_$i")
    }.groupBy(r => (r._1, r._2, r._3)).map(_._2.head).toSeq
    val rules = base.toDF("net_hi", "net_lo", "plen", "label")
    // probe half near the rules (guaranteed deep matches), half random
    val probes = base.take(30).zipWithIndex.map { case ((h, l, _, _), i) =>
      (i.toLong, h | (rnd.nextLong() & ~mHi(128)), l | rnd.nextLong() & 0xFFL)
    } ++ (30 until 120).map(i => (i.toLong, rnd.nextLong(), rnd.nextLong()))
    val logs = probes.toDF("id", "hi", "lo")
    val viaJoin = canon(Enrich.cidrJoin6(logs, col("hi"), col("lo"), rules))
    val viaLpm = canon(Enrich.cidrLookup6(logs, col("hi"), col("lo"), rules))
    assert(viaLpm == viaJoin)
    assert(viaJoin.exists(_._2.isDefined),
      "test vector must exercise matched rows")
  }

  test("cidrLookup: plen-0 default route and NULL address behave like the join") {
    val rules = Seq((0L, 0L, "default"), (0x0A000000L, 8L, "ten"))
      .toDF("net", "plen", "label")
    val logs = Seq[(Long, Option[Long])](
      (1L, Some(0x0A0B0C0DL)), (2L, Some(0x0B000000L)), (3L, None)
    ).toDF("id", "ip")
    val viaJoin = canon(Enrich.cidrJoin(logs, col("ip"), rules))
    val viaLpm = canon(Enrich.cidrLookup(logs, col("ip"), rules))
    assert(viaLpm == viaJoin)
    assert(viaLpm == Set(
      (1L, Some("ten"), Some(8L)),
      (2L, Some("default"), Some(0L)),
      (3L, None, None)))
  }

  test("property: model lookup == naive deepest-match scan on 200 random tables") {
    // pure-Scala reference model: linear scan for the deepest rule whose
    // masked address equals its net — no sorting, no binary search
    def mHi(maxPlen: Int, p: Int): Long =
      if (maxPlen == 32) { if (p == 0) 0L else (0xFFFFFFFFL << (32 - p)) & 0xFFFFFFFFL }
      else if (p == 0) 0L else if (p >= 64) -1L else -1L << (64 - p)
    def mLo(maxPlen: Int, p: Int): Long =
      if (maxPlen == 32 || p <= 64) 0L else -1L << (128 - p)
    def naive(rules: Array[(Long, Long, Int)], maxPlen: Int,
              hi: Long, lo: Long): Int = {
      var best = -1; var bestP = -1; var i = 0
      while (i < rules.length) {
        val (nh, nl, p) = rules(i)
        if (p > bestP && (hi & mHi(maxPlen, p)) == nh &&
            (lo & mLo(maxPlen, p)) == nl) { best = i; bestP = p }
        i += 1
      }
      best
    }
    val rnd = new scala.util.Random(1304)
    for (iter <- 0 until 200) {
      val maxPlen = if (iter % 2 == 0) 32 else 128
      val nRules = 1 + rnd.nextInt(40)
      val rules = (0 until nRules).map { _ =>
        val p = rnd.nextInt(maxPlen + 1)
        val h = if (maxPlen == 32) rnd.nextLong() & 0xFFFFFFFFL else rnd.nextLong()
        val l = if (maxPlen == 32) 0L else rnd.nextLong()
        (h & mHi(maxPlen, p), l & mLo(maxPlen, p), p)
      }.groupBy(r => (r._3, r._1, r._2)).map(_._2.head).toArray
      val model = CidrModel.build(rules, maxPlen)
      for (_ <- 0 until 50) {
        // half the probes target a random rule's block (guaranteed deep
        // matches), half are uniform
        val (hi0, lo0) =
          if (rnd.nextBoolean() && rules.nonEmpty) {
            val (nh, nl, p) = rules(rnd.nextInt(rules.length))
            (nh | (rnd.nextLong() & ~mHi(maxPlen, p)),
             nl | (rnd.nextLong() & ~mLo(maxPlen, p)))
          } else (rnd.nextLong(), rnd.nextLong())
        val (hi, lo) =
          if (maxPlen == 32) (hi0 & 0xFFFFFFFFL, 0L) else (hi0, lo0)
        val got = model.lookup(hi, lo)
        val want = naive(rules, maxPlen, hi, lo)
        // equal RULE only guaranteed when plens are unique per depth —
        // same-plen disjointness means at most one rule matches per
        // depth, so the indices must agree exactly
        assert(got == want,
          s"iter=$iter maxPlen=$maxPlen hi=$hi lo=$lo got=$got want=$want")
      }
    }
  }

  test("CidrModel.build rejects same-plen duplicate nets and bad plens") {
    intercept[IllegalArgumentException] {
      CidrModel.build(Array((5L, 0L, 9), (5L, 0L, 9)), 128)
    }
    intercept[IllegalArgumentException] {
      CidrModel.build(Array((5L, 0L, 33)), 32)
    }
  }

  test("CidrLpm participates in whole-stage codegen (no eval fallback)") {
    val rules = Seq((0x0A000000L, 8L, "ten")).toDF("net", "plen", "label")
    val logs = spark.range(100).select(col("id"),
      (col("id") % 2 * 0x0A000000L).as("ip"))
    val out = Enrich.cidrLookup(logs, col("ip"), rules)
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("cidr_lpm"))
    assert(out.filter(col("label") === "ten").select(col("n"))
      .collect().head.getLong(0) == 50L)
  }
}
