package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Session-lifetime cache of the planted test graph shared by every
  * `x_graph_*` gate (kcore, bfs, link-predict, clustering, triangles,
  * degree-dist).
  *
  * Before r10 each gate rebuilt the SAME edge list from parquet — a
  * distinct-shuffle per gate per bench run, and for the iterative gates
  * a re-checkpoint of an already-materialized relation. On a real
  * cluster the graph is materialized once and a family of analytics
  * reads it; this cache is that shape: ONE localCheckpoint'ed edge
  * relation and ONE persisted degree table per (session, dataset),
  * computed on first use, reused by every subsequent gate. Bench
  * timing stays honest — Bench pre-builds the fixtures and bills the
  * build as its own timed row (`x_graph_fixture_build`), so graph
  * gates measure their analytics, not a shared build lottery; outside
  * Bench the first caller pays the build inside its own timing.
  *
  * Keys hold the SparkSession reference so a stopped session's entry
  * (ScalaTest creates/stops sessions per suite) is rebuilt rather than
  * replayed against dead executors.
  */
object GraphFixtures {

  private val edgeCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val degCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val orientedCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val adjCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def allCaches = Seq(edgeCache, degCache, orientedCache, adjCache)

  /** ONE resident fixture set: inserting a key for a new (session,
    * dataset) evicts every OTHER key's relations first (unpersist +
    * remove). A long-lived service touching many datasets holds at most
    * one planted graph in executor memory instead of one per dataset
    * ever touched.
    */
  private def evictOthers(key: (SparkSession, String)): Unit =
    allCaches.foreach { c =>
      val it = c.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey != key) {
          try e.getValue.unpersist(blocking = false) catch { case _: Throwable => () }
          it.remove()
        }
      }
    }

  /** Drop every cached fixture (test/bench hook — lets a bench bill the
    * fixture build explicitly instead of amortizing it into medians).
    */
  def reset(): Unit =
    allCaches.foreach { c =>
      c.values().forEach(df =>
        try df.unpersist(blocking = false) catch { case _: Throwable => () })
      c.clear()
    }

  /** Number of resident fixture relations across all caches. */
  def residentCount: Int = allCaches.map(_.size).sum

  /** Eagerly-populated columnar cache. persist (InMemoryRelation) and
    * not localCheckpoint: the fixture's hottest consumer (triangle
    * counting) scans the edge relation six times, and columnar cached
    * batches feed whole-stage codegen scans where a checkpoint's
    * row-RDD iterates row-at-a-time (measured 1.9 s → 3.1 s on
    * x_graph_triangles at sf10 when this was a checkpoint). The count()
    * materializes all partitions so no consumer pays a partial build.
    */
  private def materialize(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }

  /** Planted undirected deduped edges (a, b), a < b, over
    * `documents.doc_id`: three arithmetic out-links plus the 13-hub
    * spoke (see [[Triangles.plantedEdges]]). Iterative consumers
    * (peel/BFS rounds) re-scan cached batches instead of replaying the
    * distinct.
    */
  def plantedEdges(s: SparkSession, dir: String): DataFrame = {
    // evict outside compute(): mutating other bins under this bin's lock
    // invites an AB-BA interleaving if two datasets ever build at once
    if (!edgeCache.containsKey((s, dir))) evictOthers((s, dir))
    edgeCache.compute((s, dir), (k, old) =>
      if (old != null && !k._1.sparkContext.isStopped) old
      else {
        val docs = Tables.documents(s, dir)
        val nodes = docs.select(col("doc_id").as("id"))
        val n = docs.agg(count(lit(1)).as("n"))
        materialize(Triangles.plantedEdges(nodes.crossJoin(broadcast(n)),
          col("id"), col("n")))
      })
  }

  /** Undirected degree per node of [[plantedEdges]] — |V| rows,
    * persisted; the full-graph degree feeds four gates (link-predict
    * hub suppression, clustering, degree-dist, triangle orientation).
    */
  def plantedDegrees(s: SparkSession, dir: String): DataFrame =
    degCache.compute((s, dir), (k, old) =>
      if (old != null && !k._1.sparkContext.isStopped) old
      else {
        val e = plantedEdges(s, dir)
        // explode over the 2-element endpoint array = ONE scan of the
        // cached edge relation instead of the union's two (r16)
        materialize(
          e.select(explode(array(col("a"), col("b"))).as("v"))
            .groupBy(col("v")).agg(count(lit(1)).as("dg")))
      })

  /** Degree-oriented planted edges (u, v, dv): every undirected edge
    * pointed from its lower-(deg, id) endpoint, carrying the head's
    * degree (see [[Triangles]] for why orientation defuses hubs). Both
    * triangle counting and the clustering coefficient consume exactly
    * this relation; before r10 each gate re-ran the two |V|-row degree
    * broadcasts on EVERY bench run — at sf10 two forced ~6M-row
    * broadcast builds per run, the family's main run-to-run jitter.
    */
  /** Hub-suppressed symmetric adjacency (u, w, dgw) of [[plantedEdges]]:
    * centers with degree > 64 dropped before any wedge forms (the
    * "graph stop-word" rule — a shared celebrity neighbor carries no
    * link signal and would put C(hub_deg, 2) pairs in the shuffle).
    * Each row carries the ENDPOINT's degree so the link-prediction
    * wedge can compute Jaccard denominators without any per-run |V|-row
    * degree join — the build pays the one shuffle join once per
    * session.
    */
  def suppressedAdj(s: SparkSession, dir: String): DataFrame =
    adjCache.compute((s, dir), (k, old) =>
      if (old != null && !k._1.sparkContext.isStopped) old
      else {
        val e = plantedEdges(s, dir)
        val deg = plantedDegrees(s, dir)
        val centers = broadcast(deg
          .filter(col("dg") <= 64L).select(col("v").as("u")))
        materialize(e.select(col("a").as("u"), col("b").as("w"))
          .unionAll(e.select(col("b"), col("a")))
          .join(centers, Seq("u"), "left_semi")
          .join(deg.select(col("v").as("w"), col("dg").as("dgw"))
            .hint("shuffle_hash"), Seq("w"))
          .select(col("u"), col("w"), col("dgw")))
      })

  /** Build all four fixture relations. edges → degrees are sequential
    * (degrees reads edges), but oriented and suppressed depend only on
    * those two, not on each other — overlap their jobs from a 2-thread
    * pool so one build's straggler tail back-fills with the other's
    * tasks (guide §2.6). On failure the sibling task is cancelled
    * (shutdownNow + await) so no background build contaminates whatever
    * the caller times next.
    */
  def buildAll(s: SparkSession, dir: String): Unit = {
    plantedEdges(s, dir)
    plantedDegrees(s, dir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fs = Seq(
        () => orientedPlanted(s, dir),
        () => suppressedAdj(s, dir)
      ).map(f => pool.submit(new java.util.concurrent.Callable[AnyRef] {
        def call(): AnyRef = f()
      }))
      fs.foreach(_.get())
    } catch { case t: Throwable =>
      pool.shutdownNow()
      pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)
      throw t
    } finally pool.shutdown()
  }

  def orientedPlanted(s: SparkSession, dir: String): DataFrame =
    orientedCache.compute((s, dir), (k, old) =>
      if (old != null && !k._1.sparkContext.isStopped) old
      else {
        val deg = plantedDegrees(s, dir)
        val da = deg.select(col("v").as("a"), col("dg").as("dga"))
        val db = deg.select(col("v").as("b"), col("dg").as("dgb"))
        val fwd = col("dga") < col("dgb") ||
          (col("dga") === col("dgb") && col("a") < col("b"))
        materialize(plantedEdges(s, dir)
          .join(da.hint("shuffle_hash"), "a")
          .join(db.hint("shuffle_hash"), "b")
          .select(
            when(fwd, col("a")).otherwise(col("b")).as("u"),
            when(fwd, col("b")).otherwise(col("a")).as("v"),
            when(fwd, col("dgb")).otherwise(col("dga")).as("dv")))
      })
}
