package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.storage.StorageLevel

/** Bounded k-core peeling: `rounds` passes of "drop nodes with degree
  * < k, keep only edges between survivors". A fixed pass budget (not
  * convergence detection) keeps the computation replayable by an
  * unrolled SQL oracle; each pass is one degree aggregate plus two
  * semi-joins, and the edge set only shrinks, so pass cost is monotone
  * non-increasing — the 100 TB shape of the standard distributed
  * peeling loop. Per-round metrics are the output (the peeling curve
  * itself is the useful observability signal: how fast the graph's
  * periphery evaporates).
  *
  * Iteration mechanics (r10): each round's edge set localCheckpoints —
  * persist-only rounds were tried and rejected because without lineage
  * truncation the SQL listener renders the ~5^rounds nested plan
  * string on every action (OOM at rounds=5, sf0.01). What r10 changes:
  * per-round metrics are computed EAGERLY into driver-side longs
  * (bounded by `rounds` — after the loop nothing references the
  * intermediate round relations, so the ContextCleaner reclaims their
  * checkpoint blocks instead of them accumulating for the session),
  * and the per-round degree cache is explicitly dropped as soon as the
  * next round is materialized (the r9 leak).
  */
object KCore {

  private[graph] val MaxRounds = 8

  /** Returns (round, n_nodes, n_edges) for rounds 1..`rounds`, where
    * round i reports the graph AFTER the i-th peel. Input: undirected
    * deduped edges (a, b), a < b.
    *
    * @param inputMaterialized the caller passes an already-cached /
    *   checkpointed relation (e.g. [[GraphFixtures.plantedEdges]]);
    *   skips the defensive round-0 checkpoint that would otherwise
    *   re-copy it (round 1 reads the input three times: degree, join,
    *   metrics).
    */
  def peel(edgesRaw: DataFrame, k: Int, rounds: Int,
           inputMaterialized: Boolean = false): DataFrame = {
    require(rounds <= MaxRounds,
      s"peel is a bounded-loop operator: rounds=$rounds > $MaxRounds; " +
        "chunk longer runs with explicit checkpoints between chunks")
    val spark = edgesRaw.sparkSession
    // ONE scan of the edge set per degree build (r16 optimization
    // round): the former unionAll form scanned e twice (once per
    // endpoint projection) — with the lazy per-round checkpoint below,
    // a double scan inside the materializing job could even compute a
    // yet-uncached partition twice. explode over the 2-element endpoint
    // array is the same multiset of vertex rows from a single pass.
    def degOf(e: DataFrame): DataFrame =
      e.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("dg"))
    val round0 =
      if (inputMaterialized) edgesRaw
      else edgesRaw.localCheckpoint(eager = false) // round 1 materializes
    var edges = round0
    var deg = degOf(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val metrics = Seq.newBuilder[(Long, Long, Long)]
    for (r <- 1 to rounds) {
      // peel by ANTI-joining the DROPPED set (deg < k): after round 1
      // almost every node survives, so the dropped periphery is the
      // small side — broadcasting it costs KBs where the survivor set
      // is |V|-sized (the r9 design broadcast ~5M survivor ids per
      // round at sf10; that build was most of the 1.7 s/round barrier).
      // Equivalent semantics: every edge endpoint has a degree row, so
      // "neither endpoint dropped" ≡ "both endpoints kept".
      val dropped = broadcast(deg.filter(col("dg") < k).select(col("v")))
      val oldDeg = deg
      val oldEdges = edges
      edges = edges
        .join(dropped.select(col("v").as("a")), Seq("a"), "left_anti")
        .join(dropped.select(col("v").as("b")), Seq("b"), "left_anti")
        .select(col("a"), col("b"))
        // truncate the iterative lineage (see scaladoc). LAZY (r16
        // optimization round): the fused degree/metrics aggregate below
        // is the round barrier that materializes the new edge set —
        // one job per round instead of a checkpoint job plus a metrics
        // job (degOf scans edges once, so nothing is computed twice)
        .localCheckpoint(eager = false)
      deg = degOf(edges).persist(StorageLevel.MEMORY_AND_DISK)
      // ONE fused aggregate yields both metrics (Σdg = 2·|E|) and
      // materializes the persisted degree table for the next round's
      // dropped-set broadcast — one job instead of two counts
      val row = deg.agg(count(lit(1)).as("n"),
        coalesce(sum(col("dg")), lit(0L)).as("sdg")).collect()(0)
      val (nNodes, nEdges) = (row.getLong(0), row.getLong(1) / 2)
      // the previous round's caches are dead weight once the new round
      // is materialized — drop them NOW: the async ContextCleaner lags
      // a full ~|E|-block set per round, and in a shared JVM that lag
      // bills storage-eviction churn to whatever query runs next (the
      // r10 clustering 2.6→13.5 s in-suite artifact)
      oldDeg.unpersist(false)
      if (oldEdges ne round0) shim.freeLocalCheckpoint(oldEdges)
      metrics += ((r.toLong, nNodes, nEdges))
    }
    deg.unpersist(false)
    if (edges ne round0) shim.freeLocalCheckpoint(edges)
    // round0 is freed only when WE made the defensive checkpoint — a
    // caller-materialized fixture is shared across gates
    if (!inputMaterialized) shim.freeLocalCheckpoint(round0)
    import spark.implicits._
    metrics.result().toDF("round", "n_nodes", "n_edges")
  }

  /** Bounded BFS from `source` over undirected edges (a, b): per-round
    * frontier sizes for rounds 1..`rounds` (round r = nodes first
    * reached in exactly r hops). Frontier expansion is one equi-join on
    * the edge key plus an anti-join against the visited set — the
    * Pregel step as DataFrames. Frontiers localCheckpoint per round
    * (lineage truncation); counts collapse eagerly to driver-side
    * longs so no round relation outlives the call.
    */
  def bfsLayers(edges: DataFrame, source: Long, rounds: Int,
                inputMaterialized: Boolean = false): DataFrame = {
    require(rounds <= MaxRounds,
      s"bfsLayers is a bounded-loop operator: rounds=$rounds > $MaxRounds")
    val spark = edges.sparkSession
    import spark.implicits._
    val adjPlan = edges.select(col("a").as("u"), col("b").as("v"))
      .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
    // when the input is already materialized the adjacency view is two
    // cheap projections over cached blocks — re-checkpointing it would
    // double-store 2|E| rows for a ≤`rounds`-scan consumer
    val adj = if (inputMaterialized) adjPlan else adjPlan.localCheckpoint()
    var visited = Seq(source).toDF("v").localCheckpoint()
    var frontier = visited
    // every frontier stays referenced by the visited union until the
    // loop ends; free the whole set eagerly afterwards (see peel)
    val checkpoints = scala.collection.mutable.Buffer[DataFrame](visited)
    val counts = Seq.newBuilder[(Long, Long)]
    for (r <- 1 to rounds) {
      // frontier and visited are node-id sets — broadcast keeps the
      // adjacency list from shuffling every round
      frontier = adj
        .join(broadcast(frontier.select(col("v").as("u"))), Seq("u"),
          "left_semi")
        .select(col("v")).distinct()
        .join(broadcast(visited), Seq("v"), "left_anti")
        // lazy: the count() right below is the materializing action —
        // one job per round instead of checkpoint + count (r16)
        .localCheckpoint(eager = false)
      checkpoints += frontier
      val nf = frontier.count()
      // visited is a union of already-checkpointed frontiers — its
      // lineage stays shallow, no truncation barrier needed
      visited = visited.unionAll(frontier)
      counts += ((r.toLong, nf))
    }
    checkpoints.foreach(shim.freeLocalCheckpoint)
    if (!inputMaterialized) shim.freeLocalCheckpoint(adj)
    counts.result().toDF("round", "n_frontier")
  }
}
