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
    def degOf(e: DataFrame): DataFrame =
      e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("dg"))
    // round 1 consumes the input three times (degree, join, metrics) —
    // materialize the candidate distinct chain once up front
    var edges = edgesRaw.localCheckpoint()
    var deg = degOf(edges)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var out: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      // the survivor set is ≤|V| ids; broadcasting it keeps the edge
      // list from shuffling twice per round (beyond broadcast reach the
      // hint degrades to the shuffle join, which is the honest fallback)
      val keep = broadcast(deg.filter(col("dg") >= k).select(col("v")))
      edges = edges
        .join(keep.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("v").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        // each round references its predecessor several times (degrees,
        // both semi-joins, the metrics counts) — without lineage
        // truncation the logical plan grows ~6^rounds and kills the
        // optimizer, the same blowup Components.run truncates per round
        .localCheckpoint()
      // ONE degree aggregate per round serves the node metric AND the
      // next round's survivor filter (persisted: both consumers are
      // tiny relative to the 2|E|-row aggregate that builds it)
      deg = degOf(edges)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val m = edges.agg(count(lit(1)).as("n_edges"))
        .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"))))
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
      // frontier and visited are node-id sets — broadcast keeps the
      // adjacency list from shuffling every round
      frontier = adj
        .join(broadcast(frontier.select(col("v").as("u"))), Seq("u"),
          "left_semi")
        .select(col("v")).distinct()
        .join(broadcast(visited), Seq("v"), "left_anti")
        .localCheckpoint()
      // visited is a union of already-checkpointed frontiers — its
      // lineage stays shallow, no truncation barrier needed
      visited = visited.unionAll(frontier)
      val m = frontier.agg(count(lit(1)).as("n_frontier"))
        .select(lit(r.toLong).as("round"), col("n_frontier"))
      out = Some(out.map(_.unionByName(m)).getOrElse(m))
    }
    out.get
  }
}
