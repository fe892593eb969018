package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Components

/** Connected components (alternating large-star/small-star): shapes the
  * gated x_dedup_cc fixture can't isolate — a long chain (worst case for
  * naive min-propagation), disjoint cliques, and singleton handling.
  */
class ComponentsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain contracts to its minimum (log-round worst case)") {
    val chain = (1L until 16L).map(i => (i, i + 1))
    val m = comps(chain)
    assert((2L to 16L).forall(m(_) == 1L))
  }

  test("two disjoint cliques keep separate labels") {
    val cliqueA = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val cliqueB = for (a <- 10L to 12L; b <- (a + 1) to 12L) yield (a, b)
    val m = comps(cliqueA ++ cliqueB)
    assert((2L to 4L).forall(m(_) == 1L))
    assert((11L to 12L).forall(m(_) == 10L))
    assert(!m.contains(1L) || m(1L) == 1L) // roots may self-report or be absent
  }

  test("duplicate and reversed edges are harmless") {
    val m = comps(Seq((2L, 1L), (1L, 2L), (2L, 1L), (3L, 2L)))
    assert(m(2L) == 1L && m(3L) == 1L)
  }

  test("reliable checkpoint path converges to the same components") {
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    val prev = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val chain = (1L until 10L).map(i => (i, i + 1))
      val m = Components.connectedComponents(
        chain.toDF("src", "dst"), "src", "dst", reliable = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((2L to 10L).forall(m(_) == 1L))
      // the durable checkpoint actually wrote RDD data under the dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .anyMatch(p => p.getFileName.toString.startsWith("part-"))
      assert(wrote, "no checkpoint files written to the checkpoint dir")
    } finally prev.foreach(spark.sparkContext.setCheckpointDir)
  }

  test("clusters: singletons get their own id, canonical is the min member") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Components.clusters(docs, col("doc_id"), pairs, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, true), (2L, 1L, 3L, false), (3L, 1L, 3L, false),
      (4L, 4L, 1L, true), (5L, 5L, 1L, true)))
  }

  test("clustersKeeping: feature columns ride along, assignment matches clusters") {
    val perDoc = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("doc_id", "feat")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val kept = Components.clustersKeeping(perDoc, pairs, "doc_a", "doc_b")
    assert(kept.columns.toSeq ==
      Seq("doc_id", "feat", "component", "cluster_size", "is_canonical"))
    val out = kept.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getBoolean(4))).sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "a", 1L, 3L, true), (2L, "b", 1L, 3L, false),
      (3L, "c", 1L, 3L, false), (4L, "d", 4L, 1L, true),
      (5L, "e", 5L, 1L, true)))
    // same assignment as the single-column form on the same input
    val plain = Components.clusters(perDoc, col("doc_id"), pairs,
      "doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(plain.toSeq == out.map(t => (t._1, t._3, t._4, t._5)).toSeq)
  }
}
