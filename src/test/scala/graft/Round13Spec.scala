package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Enrich
import graft.sketch.Sketches

/** Round-13 operators: IPv6 CIDR longest-prefix join, the single-
  * evaluation bloom semi-join + probe-only production path, and the
  * register-merge-only HLL set-ops estimator.
  */
class Round13Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // --------------------------------------------------------- cidrJoin6

  private val hiA = 0x1234567890ABCDEFL // top byte 0x12
  private val loA = 0xFF11223344556677L // top byte 0xFF (negative long)

  test("cidrJoin6: longest prefix wins across the 64-bit boundary") {
    val rules = Seq(
      (0x12L << 56, 0L, 8L, "p8"),              // /8 hi-only
      (hiA, -1L << 56 & loA, 72L, "p72"),       // full hi + 8 lo bits
      (hiA, loA, 128L, "p128")                  // exact address
    ).toDF("net_hi", "net_lo", "plen", "label")
    val logs = Seq(
      (1L, hiA, loA),                           // matches /8, /72, /128
      (2L, hiA, 0xFF00000000000001L),           // matches /8, /72
      (3L, 0x12FFFFFFFFFFFFFFL, 0L),            // matches /8 only
      (4L, 0x7700000000000000L, 0L)             // matches nothing
    ).toDF("id", "hi", "lo")
    val out = Enrich.cidrJoin6(logs, col("hi"), col("lo"), rules)
      .select(col("id"), col("label"), col("matched_plen"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), Option(r.get(2)))).toMap
    assert(out(1L) == (Some("p128"), Some(128L)))
    assert(out(2L) == (Some("p72"), Some(72L)))
    assert(out(3L) == (Some("p8"), Some(8L)))
    assert(out(4L) == (None, None))
  }

  test("cidrJoin6: plen 0 matches everything; INT plen column survives") {
    val rules = Seq((0, 0, 0, "default"))
      .toDF("net_hi", "net_lo", "plen", "label") // all-INT columns
    val logs = Seq((1L, Long.MinValue, -1L), (2L, 0L, 0L)).toDF("id", "hi", "lo")
    val out = Enrich.cidrJoin6(logs, col("hi"), col("lo"), rules)
    assert(out.filter(col("label") === "default").count() == 2)
  }

  test("cidrJoin/cidrJoin6 reject same-plen duplicate nets") {
    val dup6 = Seq((5L, 0L, 9L, "a"), (5L, 0L, 9L, "b"))
      .toDF("net_hi", "net_lo", "plen", "label")
    val logs6 = Seq((1L, 5L, 0L)).toDF("id", "hi", "lo")
    intercept[IllegalArgumentException] {
      Enrich.cidrJoin6(logs6, col("hi"), col("lo"), dup6)
    }
    val dup4 = Seq((5L, 9L, "a"), (5L, 9L, "b")).toDF("net", "plen", "label")
    val logs4 = Seq((1L, 5L)).toDF("id", "ip")
    intercept[IllegalArgumentException] {
      Enrich.cidrJoin(logs4, col("ip"), dup4)
    }
  }

  test("cidrJoin: INT plen column does not ClassCastException") {
    val rules = Seq((0x0A000000, 8, "ten")).toDF("net", "plen", "label")
    val logs = Seq((1L, 0x0A0B0C0DL), (2L, 0x0B000000L)).toDF("id", "ip")
    val got = Enrich.cidrJoin(logs, col("ip"), rules)
      .select(col("id"), col("label")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) == Some("ten") && got(2L) == None)
  }

  // ------------------------------------------------------------- bloom

  test("bloom semi-join equals the plain semi-join; probe-only is a superset") {
    val big = (1L to 2000L).map(i => (i, s"v$i")).toDF("k", "v")
    val small = Seq(3L, 3L, 17L, 999L, 1500L).toDF("k")
    val pruned = Sketches.bloomPrunedSemiJoin(big, col("k"), small, col("k"))
      .select(col("k")).as[Long].collect().sorted
    assert(pruned.toSeq == Seq(3L, 17L, 999L, 1500L))
    val probed = Sketches.bloomProbeOnly(big, col("k"), small, col("k"),
      mBits = 1 << 18).select(col("k")).as[Long].collect().toSet
    assert(Set(3L, 17L, 999L, 1500L).subsetOf(probed))
    // deterministic: the same bitset math gives the same survivor set
    val probed2 = Sketches.bloomProbeOnly(big, col("k"), small, col("k"),
      mBits = 1 << 18).select(col("k")).as[Long].collect().toSet
    assert(probed == probed2)
  }

  // ----------------------------------------------------- hll estimates

  test("hllSetOpsEstimates matches the gate operator's estimate columns") {
    val events = (1L to 3000L).map { i =>
      (if (i % 3 == 0) "click" else if (i % 3 == 1) "view" else "other",
        i % 700)
    }.toDF("event_type", "user_id")
    val full = Sketches.hllSetOps(events, col("event_type"), col("user_id"),
      "click", "view").select("est_a", "est_b", "est_union", "est_inter")
      .collect().head
    val prod = Sketches.hllSetOpsEstimates(events, col("event_type"),
      col("user_id"), "click", "view").collect().head
    assert(full.getLong(0) == prod.getLong(0))
    assert(full.getLong(1) == prod.getLong(1))
    assert(full.getLong(2) == prod.getLong(2))
    assert(full.getLong(3) == prod.getLong(3))
  }
}
