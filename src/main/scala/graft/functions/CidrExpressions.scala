package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Driver-built longest-prefix-match model over a static CIDR rule
  * table: per distinct prefix length (longest first), the pre-masked
  * network keys sorted unsigned for binary search. A 128-bit address is
  * two longs `(hi, lo)`; IPv4 rides the same model with the address in
  * `hi` and `lo = 0`. Lookup cost is k·log2(n/k) long-compares per row
  * against L1-resident arrays — the "binary search on prefix lengths"
  * family of Waldvogel et al. (SIGCOMM '97), which is how a router
  * answers the same question the reference's geoip2 filter delegates to
  * libmaxminddb's prefix tree (`plugins/filter_geoip2/geoip2.c:380`).
  *
  * Scale: a CIDR/geo database is a static dimension (MaxMind-class ≈
  * millions of rules ≈ tens of MB as four long arrays) — exactly the
  * relation a 100 TB plan wants as a broadcast reference object, not a
  * join side. The k chained broadcast hash joins this replaces each pay
  * a per-row probe of a join hash relation PLUS a null-checked output
  * row copy; the model folds all k levels into one codegen'd call.
  *
  * Same-plen rules must be disjoint (CIDR tables are; the builder
  * rejects duplicates), so the most specific hit is unique and the
  * result is bit-identical to the chained-left-join form.
  */
final class CidrModel(
    val masksHi: Array[Long],
    val masksLo: Array[Long],
    val plens: Array[Int],
    val netsHi: Array[Array[Long]],
    val netsLo: Array[Array[Long]],
    val ruleIdx: Array[Array[Int]]) extends Serializable {

  /** Global rule index of the most specific matching rule, or -1. */
  def lookup(hi: Long, lo: Long): Int = {
    var level = 0
    while (level < masksHi.length) {
      val pos = search(netsHi(level), netsLo(level),
        hi & masksHi(level), lo & masksLo(level))
      if (pos >= 0) return ruleIdx(level)(pos)
      level += 1
    }
    -1
  }

  private def search(hs: Array[Long], ls: Array[Long],
                     h: Long, l: Long): Int = {
    var lo0 = 0
    var hi0 = hs.length - 1
    while (lo0 <= hi0) {
      val mid = (lo0 + hi0) >>> 1
      var c = java.lang.Long.compareUnsigned(hs(mid), h)
      if (c == 0) c = java.lang.Long.compareUnsigned(ls(mid), l)
      if (c == 0) return mid
      else if (c < 0) lo0 = mid + 1
      else hi0 = mid - 1
    }
    -1
  }
}

object CidrModel {
  /** Build from `(netHi, netLo, plen)` rule rows (nets pre-masked, as
    * the join form requires too). `maxPlen` is 32 for IPv4-in-`hi` or
    * 128 for two-long IPv6; mask math matches [[graft.ops.Enrich]]'s
    * join forms bit for bit. Rejects same-plen duplicate nets — the
    * disjointness contract that makes LPM ≡ chained left joins.
    */
  def build(rules: Array[(Long, Long, Int)], maxPlen: Int): CidrModel = {
    require(maxPlen == 32 || maxPlen == 128, s"maxPlen $maxPlen")
    rules.foreach { case (_, _, p) =>
      require(p >= 0 && p <= maxPlen, s"plen $p out of range [0,$maxPlen]")
    }
    def maskHi(p: Int): Long =
      if (maxPlen == 32) { if (p == 0) 0L else (0xFFFFFFFFL << (32 - p)) & 0xFFFFFFFFL }
      else if (p == 0) 0L else if (p >= 64) -1L else -1L << (64 - p)
    def maskLo(p: Int): Long =
      if (maxPlen == 32 || p <= 64) 0L else -1L << (128 - p)
    val byPlen = rules.zipWithIndex.groupBy(_._1._3).toArray
      .sortBy(-_._1)
    byPlen.foreach { case (p, rs) =>
      val nets = rs.map { case ((h, l, _), _) => (h, l) }
      require(nets.distinct.length == nets.length,
        s"rules at plen=$p repeat a net — same-length CIDR rules must " +
          "be disjoint or the longest-prefix match is ambiguous")
    }
    val sorted = byPlen.map { case (p, rs) =>
      val s = rs.sortWith { case (((h1, l1, _), _), ((h2, l2, _), _)) =>
        val c = java.lang.Long.compareUnsigned(h1, h2)
        if (c != 0) c < 0 else java.lang.Long.compareUnsigned(l1, l2) < 0
      }
      (p, s)
    }
    new CidrModel(
      sorted.map { case (p, _) => maskHi(p) },
      sorted.map { case (p, _) => maskLo(p) },
      sorted.map(_._1),
      sorted.map { case (_, rs) => rs.map(_._1._1) },
      sorted.map { case (_, rs) => rs.map(_._1._2) },
      sorted.map { case (_, rs) => rs.map(_._2) })
  }
}

/** Codegen longest-prefix match: `(addrHi, addrLo)` → global rule index
  * in the model's input order, or -1 for no match (null in → null out).
  * Label / matched-plen columns derive from the index via literal-array
  * `element_at`, so the whole enrichment is ONE map-only projection —
  * zero joins, zero shuffles, zero row expansion.
  */
case class CidrLpm(left: Expression, right: Expression, model: CidrModel)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cidr_lpm requires two BIGINT address halves, got $other")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(hi: Any, lo: Any): Any =
    model.lookup(hi.asInstanceOf[Long], lo.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("cidrModel", model,
      classOf[CidrModel].getName)
    nullSafeCodeGen(ctx, ev, (hi, lo) =>
      s"${ev.value} = $m.lookup($hi, $lo);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cidr_lpm"
}
