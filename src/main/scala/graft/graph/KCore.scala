package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded k-core peeling: `rounds` passes of "drop nodes with degree
  * < k, keep only edges between survivors". A fixed pass budget (not
  * convergence detection) keeps the whole computation one declarative
  * plan chain replayable by an unrolled SQL oracle; each pass is one
  * degree aggregate plus two semi-joins, and the edge set only shrinks,
  * so pass cost is monotone non-increasing — the 100 TB shape of the
  * standard distributed peeling loop. Per-round metrics are the output
  * (the peeling curve itself is the useful observability signal: how
  * fast the graph's periphery evaporates).
  */
object KCore {

  /** Returns (round, n_nodes, n_edges) for rounds 1..`rounds`, where
    * round i reports the graph AFTER the i-th peel. Input: undirected
    * deduped edges (a, b), a < b.
    */
  def peel(edgesRaw: DataFrame, k: Int, rounds: Int): DataFrame = {
    var edges = edgesRaw
    var out: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      val deg = edges.select(col("a").as("v"))
        .unionAll(edges.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("dg"))
      val keep = deg.filter(col("dg") >= k).select(col("v"))
      edges = edges
        .join(keep.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("v").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        // each round references its predecessor ~6× (degrees, both
        // semi-joins, both metrics counts) — without lineage truncation
        // the logical plan grows 6^rounds and kills the optimizer, the
        // same blowup Components.run truncates per round
        .localCheckpoint()
      val nodes = edges.select(col("a").as("v"))
        .unionAll(edges.select(col("b").as("v")))
        .agg(countDistinct(col("v")).as("n_nodes"))
      val m = edges.agg(count(lit(1)).as("n_edges"))
        .crossJoin(broadcast(nodes))
        .select(lit(r.toLong).as("round"), col("n_nodes"), col("n_edges"))
      out = Some(out.map(_.unionByName(m)).getOrElse(m))
    }
    out.get
  }

  /** Bounded BFS from `source` over undirected edges (a, b): per-round
    * frontier sizes for rounds 1..`rounds` (round r = nodes first
    * reached in exactly r hops). Frontier expansion is one equi-join on
    * the edge key plus an anti-join against the visited set — the
    * Pregel step as DataFrames; per-round localCheckpoint truncates the
    * iterative lineage exactly like [[peel]] and Components.run.
    */
  def bfsLayers(edges: DataFrame, source: Long, rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val adj = edges.select(col("a").as("u"), col("b").as("v"))
      .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint()
    var visited = Seq(source).toDF("v").localCheckpoint()
    var frontier = visited
    var out: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      frontier = adj
        .join(frontier.select(col("v").as("u")), Seq("u"), "left_semi")
        .select(col("v")).distinct()
        .join(visited, Seq("v"), "left_anti")
        .localCheckpoint()
      visited = visited.unionAll(frontier).localCheckpoint()
      val m = frontier.agg(count(lit(1)).as("n_frontier"))
        .select(lit(r.toLong).as("round"), col("n_frontier"))
      out = Some(out.map(_.unionByName(m)).getOrElse(m))
    }
    out.get
  }
}
