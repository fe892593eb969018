package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextAnalysis

/** Round-12 curation/governance operators: PMI collocations, l-diversity
  * flags, file-stats scan pruning.
  */
class Curate2Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("pmi: perfectly-associated bigram scores 1e6*c_xy*N/(c_x*c_y) exactly") {
    // 5 "new york" occurrences among 20 tokens => 19 bigrams total;
    // c_xy = 5, c_x = c_y = 5 => pmi_ppm = 1e6*5*19/25 = 3_800_000
    val docs = Seq(
      "new york a b new york c d new york e f new york g h new york i j"
    ).toDF("text")
    val out = TextAnalysis.pmiCollocations(docs, col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("new york", 5L, 5L, 5L, 3800000L)))
  }

  test("pmi: min-support prunes and ties rank by bigram asc") {
    // 23 tokens => N = 22 bigrams: "p q" x6, "q p" x6, "p r" x5,
    // "r p" x4, "r z" x1. Support >= 5 keeps the first three; "r p"
    // and "r z" prune. c(p)=11, c(q)=6, c(r)=5, so all three score
    // 1e6*6*22/(11*6) = 1e6*5*22/(11*5) = 2_000_000 — a three-way tie
    // ordered by bigram text ascending.
    val text = (Seq.fill(6)("p q") ++ Seq.fill(5)("p r")).mkString(" ") + " z"
    val out = TextAnalysis.pmiCollocations(Seq(text).toDF("text"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(4)))
    // tie order is by (h1, h2) hash — assert the SET, not the sequence
    assert(out.toSet == Set(("p q", 2000000L), ("p r", 2000000L),
      ("q p", 2000000L)))
  }

  test("ldiversity gate: flags are consistent with their counts at sf0.001") {
    val rows = SparkEntry.queries("x_ldiversity")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nSeg, maxCnt, nRows) = (r.getAs[Long]("n_seg"),
        r.getAs[Long]("max_cnt"), r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("l_ok") == (if (nSeg >= 3) 1L else 0L))
      assert(r.getAs[Long]("homog_risk") ==
        (if (maxCnt * 5 > nRows * 4) 1L else 0L))
      assert(maxCnt <= nRows && nSeg <= nRows)
    }
  }

  test("readability: hand-computed FK grade on a known sentence pair") {
    // "See spot run. It is fun." -> W=6, X=2, S=6 vowel groups;
    // FK = 0.39*3 + 11.8*1 - 15.59 = -2.62 => 10000 - 262 = 9738
    val out = TextAnalysis.readability(
        Seq((1L, "See spot run. It is fun.")).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .collect().head
    assert(out.getAs[Long]("words") == 6L)
    assert(out.getAs[Long]("sentences") == 2L)
    assert(out.getAs[Long]("syllables") == 6L)
    assert(out.getAs[Long]("fk_centi_p10k") == 9738L)
    assert(out.getAs[String]("band") == "easy")
  }

  test("cidr join: longest prefix wins, unmatched rows keep null") {
    // 10.0.0.0/8 (label "eight") contains 10.1.0.0/16 (label "sixteen")
    val rules = Seq(
      (10L << 24, 8L, "eight"),
      ((10L << 24) | (1L << 16), 16L, "sixteen")
    ).toDF("net", "plen", "label")
    val probes = Seq(
      (1L, (10L << 24) | (1L << 16) | 5L), // in /16 AND /8 -> /16 wins
      (2L, (10L << 24) | (2L << 16) | 5L), // only /8
      (3L, (11L << 24) | 1L)               // unmatched
    ).toDF("id", "ip")
    val out = graft.ops.Enrich.cidrJoin(probes, col("ip"), rules)
      .select(col("id"), col("label"), col("matched_plen"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out(1L) == ((Some("sixteen"), Some(16L))))
    assert(out(2L) == ((Some("eight"), Some(8L))))
    assert(out(3L) == ((None, None)))
  }

  test("zorder pruning: both dims prune, never worse than time-sorted") {
    val byLayout = SparkEntry.queries("x_layout_zorder_prune")(spark, sf)
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    val t = byLayout("time"); val z = byLayout("zorder")
    assert(t.getAs[Long]("rows_total") == z.getAs[Long]("rows_total"))
    // the 2-dim predicate prunes MORE under the z-curve layout: its
    // cells are tight rectangles in both dims, so the value band cuts
    // files the time layout must read
    assert(z.getAs[Long]("rows_scanned") <= t.getAs[Long]("rows_scanned"))
    assert(z.getAs[Long]("scan_ppm") <= 1000000L &&
      t.getAs[Long]("scan_ppm") <= 1000000L)
  }

  test("stats pruning: time layout prunes, hash layout reads everything") {
    val byLayout = SparkEntry.queries("x_layout_stats_prune")(spark, sf)
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    val t = byLayout("time"); val h = byLayout("hash")
    // same data behind both layouts
    assert(t.getAs[Long]("rows_total") == h.getAs[Long]("rows_total"))
    // time-clustered stats are tight: the 6 h window hits ~1/120 files
    assert(t.getAs[Long]("files_read") < t.getAs[Long]("n_files"))
    assert(t.getAs[Long]("scan_ppm") < 100000L) // < 10 % of rows scanned
    // hash layout straddles the window in every file: nothing prunes
    assert(h.getAs[Long]("files_read") == h.getAs[Long]("n_files"))
    assert(h.getAs[Long]("scan_ppm") == 1000000L)
  }
}
