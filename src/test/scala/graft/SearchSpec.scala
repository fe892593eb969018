package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Search
import graft.graph.PageRank
import graft.queries.Registry

class SearchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("postings: tf sums to the token count; first_pos heads positions") {
    val docs = graft.model.Tables.documents(spark, sf)
    val nTokens = Search.tokens(docs, col("doc_id"), col("text")).count()
    val p = Registry.queries("x_search_postings")(spark, sf)
    assert(p.agg(sum("tf")).collect().head.getLong(0) == nTokens)
    val bad = p.filter(
      split(col("positions"), ",").getItem(0).cast("long") =!= col("first_pos"))
      .count()
    assert(bad == 0)
  }

  test("phrase: adjacency only, overlapping repeats counted") {
    val docs = Seq(
      (1L, "a b a b"),   // "a b" twice
      (2L, "b a"),       // reversed — no match
      (3L, "a a b")      // once (second a)
    ).toDF("id", "txt")
    val out = Search.phrase(docs, col("id"), col("txt"), "a", "b")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_matches"))
      .toMap
    assert(out == Map(1L -> 2L, 3L -> 1L))
  }

  test("boolean: AND/NOT flags, no join in the plan") {
    val docs = Seq(
      (1L, "x y z"), (2L, "x z"), (3L, "x y q")
    ).toDF("id", "txt")
    val got = Search.boolean(docs, col("id"), col("txt"),
      all = Seq("x", "y"), none = Seq("z"))
    assert(got.collect().map(_.getLong(0)).toSeq == Seq(3L))
    val plan = Registry.queries("x_search_boolean")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("phrase plan: doc-keyed equi-join, no cartesian") {
    val plan = Registry.queries("x_search_phrase")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("pagerank: a 2-cycle is a fixed point at rank 10^6") {
    val nodes = Seq(0L, 1L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val r = PageRank.run(edges, nodes, iters = 3).collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[Long]("rank_fp")).toMap
    assert(r == Map(0L -> 1000000L, 1L -> 1000000L))
  }

  test("pagerank: mass approximately conserved (floor losses only)") {
    val out = Registry.queries("x_graph_pagerank")(spark, sf)
    val n = out.count()
    val mass = out.agg(sum("rank_fp")).collect().head.getLong(0)
    assert(mass <= n * 1000000L && mass >= n * 900000L,
      s"mass $mass for $n nodes")
  }

  test("rrf fusion: integer contributions, missing-leg ids, tie-break") {
    val legA = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rk")
    val legB = Seq((2L, 1L), (4L, 2L)).toDF("id", "rk")
    val fused = Search.rrfFuse(Seq(legA, legB), "id", "rk",
        kRrf = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    def c(rank: Long) = 1000000000L / (60L + rank)
    // id 2 appears in BOTH legs (ranks 2 and 1); singles keep one term
    val expect = Seq(
      (2L, c(2) + c(1), 2L, 1L),
      (1L, c(1), 1L, 2L),
      (4L, c(2), 1L, 3L),
      (3L, c(3), 1L, 4L))
    assert(fused.toSeq == expect, fused.mkString(", "))
  }
}
