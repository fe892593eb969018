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
    // the gate pre-collects its 1-row result (cache hygiene), so probe
    // the un-collected plan directly
    val (df, cleanup) = Triangles.lazyPlan(
      graft.graph.GraphFixtures.plantedEdges(spark, sf),
      inputMaterialized = true)
    try {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    } finally cleanup()
  }

  // --- k-core ------------------------------------------------------------

  test("kcore: pendant peels off, the triangle core is stable") {
    val rows = graft.graph.KCore.peel(edges((0L, 1L), (0L, 2L), (1L, 2L),
        (2L, 3L)), k = 2, rounds = 3)
      .collect().map(r => r.getAs[Long]("round") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"))).toMap
    assert(rows(1L) == (3L, 3L)) // node 3 (deg 1) peeled
    assert(rows(2L) == (3L, 3L) && rows(3L) == (3L, 3L)) // fixed point
  }

  test("kcore: k above max degree empties the graph in one pass") {
    val rows = graft.graph.KCore.peel(edges((0L, 1L), (1L, 2L)), k = 2,
        rounds = 2)
      .collect().map(r => r.getAs[Long]("round") -> r.getAs[Long]("n_edges"))
      .toMap
    assert(rows(1L) == 0L && rows(2L) == 0L)
  }

  test("kcore gate: the peeling curve is monotone non-increasing") {
    val rows = Registry.queries("x_graph_kcore")(spark, sf)
      .orderBy("round").collect()
    assert(rows.length == 5)
    for (Array(p, n) <- rows.sliding(2)) {
      assert(n.getAs[Long]("n_nodes") <= p.getAs[Long]("n_nodes"))
      assert(n.getAs[Long]("n_edges") <= p.getAs[Long]("n_edges"))
    }
  }

  // --- BFS ----------------------------------------------------------------

  test("bfs: path graph frontiers are one node per hop, then exhausted") {
    val rows = graft.graph.KCore.bfsLayers(
        edges((0L, 1L), (1L, 2L), (2L, 3L)), source = 0L, rounds = 4)
      .collect().map(r => r.getAs[Long]("round") ->
        r.getAs[Long]("n_frontier")).toMap
    assert(rows == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("bfs: an already-visited neighbor never re-enters the frontier") {
    // triangle: round 1 reaches {1,2}, round 2 reaches nothing new
    val rows = graft.graph.KCore.bfsLayers(
        edges((0L, 1L), (0L, 2L), (1L, 2L)), source = 0L, rounds = 2)
      .collect().map(r => r.getAs[Long]("round") ->
        r.getAs[Long]("n_frontier")).toMap
    assert(rows == Map(1L -> 2L, 2L -> 0L))
  }

  // --- cube / retention ladder ---------------------------------------------

  test("cube: every grouping level conserves the grand total") {
    val rows = Registry.queries("x_olap_cube")(spark, sf).collect()
    val total = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(total.length == 1)
    val n = total.head.getAs[Long]("n")
    for (g <- Seq(0L, 1L, 2L))
      assert(rows.filter(_.getAs[Long]("gid") == g)
        .map(_.getAs[Long]("n")).sum == n, s"gid=$g must sum to $n")
  }

  test("retention ladder: all three resolutions conserve count and cents") {
    val rows = Registry.queries("x_series_retention_ladder")(spark, sf)
      .collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(3L, 5L, 6L)) // (s,b10m) / (s,b1h) / (s,b1d)
    val sums = byGid.view.mapValues(rs =>
      (rs.map(_.getAs[Long]("n")).sum,
        rs.map(_.getAs[Long]("sum_cents")).sum)).toMap
    assert(sums(3L) == sums(5L) && sums(5L) == sums(6L))
  }

  // --- paths / gini / seasonal anomaly ------------------------------------

  test("top paths: ≤20 rows, descending with total-ordered ties") {
    val rows = Registry.queries("x_obs_top_paths")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    for (Array(a, b) <- rows.sliding(2)) {
      val (na, nb) = (a.getAs[Long]("n_sessions"), b.getAs[Long]("n_sessions"))
      assert(na > nb ||
        (na == nb && a.getAs[String]("path") < b.getAs[String]("path")))
    }
  }

  test("gini: bounded in [0, 1e6), totals positive") {
    val rows = Registry.queries("x_profile_gini")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val g = r.getAs[Long]("gini_ppm")
      assert(g >= 0L && g < 1000000L)
      assert(r.getAs[Long]("total") >= r.getAs[Long]("n_users"))
    }
  }

  test("seasonal anomaly: outliers bounded, MAD non-negative") {
    val rows = Registry.queries("x_obs_seasonal_anomaly")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n_total"))
      assert(r.getAs[Long]("mad_v") >= 0L)
    }
  }

  // --- drift / vocab growth / funnel latency / compaction ------------------

  test("drift TVD: bounded in [0, 1e6], both periods populated") {
    val rows = Registry.queries("x_drift_tvd")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val t = r.getAs[Long]("tvd_ppm")
      assert(t >= 0L && t <= 1000000L)
      assert(r.getAs[Long]("n_before") > 0L && r.getAs[Long]("n_after") > 0L)
    }
  }

  test("vocab growth: monotone in k, caps at the distinct-term count") {
    val rows = Registry.queries("x_text_vocab_growth")(spark, sf)
      .orderBy("k").collect()
    for (Array(a, b) <- rows.sliding(2)) {
      assert(a.getAs[Long]("vocab") <= b.getAs[Long]("vocab"))
      assert(a.getAs[Long]("tokens") <= b.getAs[Long]("tokens"))
    }
    val allTerms = graft.text.Search.tokens(
        graft.model.Tables.documents(spark, sf), col("doc_id"), col("text"))
      .select("term").distinct().count()
    assert(rows.last.getAs[Long]("vocab") == allTerms)
  }

  test("funnel latency: p50 ≤ p90, non-negative") {
    val rows = Registry.queries("x_obs_funnel_latency")(spark, sf)
      .collect().map(r => r.getAs[String]("q") -> r.getAs[Long]("value"))
      .toMap
    assert(rows.keySet == Set("p50", "p90"))
    assert(rows("p50") >= 0L && rows("p50") <= rows("p90"))
  }

  test("compaction: every bin holds files and conserves total bytes") {
    val files = graft.model.Tables.events(spark, sf)
      .groupBy(col("event_type"),
        expr("(ts_ns div 1000 div 600000000) * 600000000"))
      .agg(sum(length(col("props")) + 16L).as("b"))
      .agg(sum(col("b"))).collect().head.getLong(0)
    val rows = Registry.queries("x_layout_compaction")(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("n_files") >= 1L))
    assert(rows.map(_.getAs[Long]("bytes")).sum == files)
  }

  // --- quantile normalize / winsorize / degree dist ------------------------

  test("quantile normalize: per-source monotone, range-preserving") {
    val rows = Registry.queries("x_quantile_normalize")(spark, sf).collect()
    val docs = graft.model.Tables.documents(spark, sf)
      .select("n_chars").collect().map(_.getLong(0))
    assert(rows.length == docs.length)
    for (r <- rows) {
      val n = r.getAs[Long]("norm_chars")
      assert(n >= docs.min && n <= docs.max)
    }
    for ((_, g) <- rows.groupBy(_.getAs[String]("source"))) {
      val sorted = g.sortBy(r => (r.getAs[Long]("n_chars"),
        r.getAs[Long]("doc_id")))
      for (Array(a, b) <- sorted.sliding(2))
        assert(a.getAs[Long]("norm_chars") <= b.getAs[Long]("norm_chars"))
    }
  }

  test("winsorize: bounds ordered, clipped sum inside [n·lo, n·hi]") {
    val rows = Registry.queries("x_series_winsorize")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (lo, hi, n, cs) = (r.getAs[Long]("lo"), r.getAs[Long]("hi"),
        r.getAs[Long]("n"), r.getAs[Long]("clipped_sum"))
      assert(lo <= hi)
      assert(cs >= n * lo && cs <= n * hi)
    }
  }

  test("degree distribution: node count conserved, bucket ranges honest") {
    val rows = Registry.queries("x_graph_degree_dist")(spark, sf).collect()
    val tri = Registry.queries("x_graph_triangles")(spark, sf)
      .collect().head
    assert(rows.map(_.getAs[Long]("n_nodes")).sum ==
      tri.getAs[Long]("n_nodes"))
    for (r <- rows) {
      assert(r.getAs[Long]("dg_min") <= r.getAs[Long]("dg_max"))
      if (r.getAs[Long]("bucket") <= 16L)
        assert(r.getAs[Long]("dg_min") == r.getAs[Long]("bucket"))
    }
  }

  // --- error budget / link prediction --------------------------------------

  test("error budget: remaining never exceeds 100%, cumulative sums climb") {
    val rows = Registry.queries("x_obs_error_budget")(spark, sf)
      .orderBy("bucket_us").collect()
    assert(rows.nonEmpty)
    for (r <- rows) assert(r.getAs[Long]("remaining_ppm") <= 1000000L)
    for (Array(a, b) <- rows.sliding(2)) {
      assert(a.getAs[Long]("cum_req") < b.getAs[Long]("cum_req"))
      assert(a.getAs[Long]("cum_err") <= b.getAs[Long]("cum_err"))
    }
  }

  test("link prediction: 20 candidates, valid Jaccard, descending order") {
    val rows = Registry.queries("x_graph_link_predict")(spark, sf).collect()
    assert(rows.length == 20)
    for (r <- rows) {
      val j = r.getAs[Long]("jaccard_ppm")
      assert(j > 0L && j <= 1000000L)
      assert(r.getAs[Long]("x") < r.getAs[Long]("y"))
    }
    for (Array(a, b) <- rows.sliding(2))
      assert(a.getAs[Long]("jaccard_ppm") >= b.getAs[Long]("jaccard_ppm"))
  }

  // --- skew / growth accounting / clustering coefficient -------------------

  test("skew profiler: imbalance is ≥1 by construction, both keys reported") {
    val rows = Registry.queries("x_profile_skew")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("key_col")).toSet ==
      Set("user_id", "event_type"))
    for (r <- rows) {
      assert(r.getAs[Long]("skew_ppm") >= 1000000L) // max ≥ mean always
      assert(r.getAs[String]("top_key").nonEmpty)
    }
  }

  test("new vs returning: first day is all-new, totals conserve users") {
    val rows = Registry.queries("x_obs_new_returning")(spark, sf)
      .orderBy("day").collect()
    assert(rows.head.getAs[Long]("returning_users") == 0L)
    val users = graft.model.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("new_users")).sum == users)
  }

  test("stickiness: DAU never exceeds trailing WAU") {
    val rows = Registry.queries("x_obs_stickiness")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("wau"))
      assert(r.getAs[Long]("stickiness_ppm") <= 1000000L)
    }
  }

  test("clustering coefficient: bounded by 1, triangles fit the degree") {
    val rows = Registry.queries("x_graph_clustering")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (dg, tri) = (r.getAs[Long]("dg"), r.getAs[Long]("tri"))
      assert(2L * tri <= dg * (dg - 1L))
      assert(r.getAs[Long]("cc_ppm") <= 1000000L)
    }
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

  test("fixture cache: a second dataset evicts the first (one resident set)") {
    import graft.graph.GraphFixtures
    GraphFixtures.reset()
    GraphFixtures.plantedDegrees(spark, sf) // builds edges + degrees for sf
    val afterFirst = GraphFixtures.residentCount
    assert(afterFirst >= 2, s"expected edges+degrees resident, got $afterFirst")
    GraphFixtures.plantedEdges(spark, "/root/testdata/sf0.01")
    // only the new dataset's edge relation remains
    assert(GraphFixtures.residentCount == 1,
      s"resident after switch: ${GraphFixtures.residentCount}")
    GraphFixtures.reset()
    assert(GraphFixtures.residentCount == 0)
  }
}
