package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.Triangles
import graft.text.Search
import graft.queries.Registry

/** Hand-built fixtures for degree-oriented triangle counting and BM25
  * ranking, plus sf-level invariants for the basket/AB/k-anon gates
  * (whose exact math the DuckDB hash gate proves).
  */
class TrianglesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def edges(es: (Long, Long)*) =
    es.toSeq.toDF("a", "b")

  test("K4: four wedges, all close — 4 triangles") {
    val out = Triangles.run(edges((0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 2L), (1L, 3L), (2L, 3L))).collect().head
    assert(out.getAs[Long]("n_nodes") == 4L)
    assert(out.getAs[Long]("n_edges") == 6L)
    assert(out.getAs[Long]("n_wedges") == 4L)
    assert(out.getAs[Long]("n_triangles") == 4L)
  }

  test("path 0-1-2: orientation points both edges AT the center — no wedge") {
    // A center-based enumeration would see a wedge at node 1; the
    // degree orientation (0→1, 2→1) sees none, which is the skew fix.
    val out = Triangles.run(edges((0L, 1L), (1L, 2L))).collect().head
    assert(out.getAs[Long]("n_wedges") == 0L)
    assert(out.getAs[Long]("n_triangles") == 0L)
  }

  test("triangle + pendant: one wedge, one triangle") {
    val out = Triangles.run(edges((0L, 1L), (0L, 2L), (1L, 2L),
      (2L, 3L))).collect().head
    assert(out.getAs[Long]("n_wedges") == 1L)
    assert(out.getAs[Long]("n_triangles") == 1L)
  }

  test("triangles gate: wedge bound holds and planted hubs exist at sf") {
    val out = Registry.queries("x_graph_triangles")(spark, sf)
      .collect().head
    assert(out.getAs[Long]("n_triangles") <= out.getAs[Long]("n_wedges"))
    assert(out.getAs[Long]("n_edges") > out.getAs[Long]("n_nodes"))
  }

  test("orientation joins broadcast the degree table") {
    val plan = Registry.queries("x_graph_triangles")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  // --- BM25 --------------------------------------------------------------

  test("bm25: score is the exact rational, higher tf ranks first") {
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "b b b"))
      .toDF("doc_id", "text")
    val out = Search.bm25(docs, col("doc_id"), col("text"), Seq("a"), 10)
      .orderBy("rk").collect()
    // N=3, S=8, df(a)=2; doc1: tf=2, dl=3 → 1056/1325
    assert(out.head.getAs[Long]("doc_id") == 1L)
    assert(out.head.getAs[Double]("score") == 1056.0 / 1325.0)
    assert(out.length == 2 && out(1).getAs[Long]("doc_id") == 2L)
  }

  test("bm25: longer doc scores below shorter at equal tf") {
    val docs = Seq((1L, "q x"), (2L, "q x x x x x x x"))
      .toDF("doc_id", "text")
    val out = Search.bm25(docs, col("doc_id"), col("text"), Seq("q"), 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
      .toMap
    assert(out(1L) > out(2L))
  }

  // --- basket / AB / k-anon invariants ------------------------------------

  test("assoc rules: confidence ≤ 1e6, pairs ordered, counts consistent") {
    val rows = Registry.queries("x_assoc_rules")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[String]("ta") < r.getAs[String]("tb"))
      assert(r.getAs[Long]("conf_a_ppm") <= 1000000L)
      assert(r.getAs[Long]("conf_b_ppm") <= 1000000L)
      assert(r.getAs[Long]("cnt_ab") <= math.min(r.getAs[Long]("cnt_a"),
        r.getAs[Long]("cnt_b")))
    }
  }

  test("ab lift: converters never exceed exposed") {
    val r = Registry.queries("x_ab_lift")(spark, sf).collect().head
    assert(r.getAs[Long]("conv_a") <= r.getAs[Long]("exposed_a"))
    assert(r.getAs[Long]("conv_b") <= r.getAs[Long]("exposed_b"))
    assert(r.getAs[Long]("cr_a_ppm") <= 1000000L)
  }

  test("k-anonymity: flags match the class size rule") {
    val rows = Registry.queries("x_kanonymity")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert((r.getAs[Long]("k_ok") == 1L) == (r.getAs[Long]("n_users") >= 5L))
  }
}
