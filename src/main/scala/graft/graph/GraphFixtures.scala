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
  * timing stays honest — the first gate that touches a dataset pays
  * the build inside its timed region.
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

  /** Planted undirected deduped edges (a, b), a < b, over
    * `documents.doc_id`: three arithmetic out-links plus the 13-hub
    * spoke (see [[Triangles.plantedEdges]]). Materialized via
    * localCheckpoint — iterative consumers (peel/BFS rounds) re-scan
    * cached blocks instead of replaying the distinct.
    */
  def plantedEdges(s: SparkSession, dir: String): DataFrame =
    edgeCache.compute((s, dir), (k, old) =>
      if (old != null && !k._1.sparkContext.isStopped) old
      else {
        val docs = Tables.documents(s, dir)
        val nodes = docs.select(col("doc_id").as("id"))
        val n = docs.agg(count(lit(1)).as("n"))
        Triangles.plantedEdges(nodes.crossJoin(broadcast(n)),
          col("id"), col("n")).localCheckpoint()
      })

  /** Undirected degree per node of [[plantedEdges]] — |V| rows,
    * persisted; the full-graph degree feeds four gates (link-predict
    * hub suppression, clustering, degree-dist, triangle orientation).
    */
  def plantedDegrees(s: SparkSession, dir: String): DataFrame =
    degCache.compute((s, dir), (k, old) =>
      if (old != null && !k._1.sparkContext.isStopped) old
      else {
        val e = plantedEdges(s, dir)
        e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("dg"))
          .localCheckpoint()
      })
}
