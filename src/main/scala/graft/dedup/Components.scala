package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the clustering
  * stage that turns pairwise candidates (MinHash-LSH, SimHash banding,
  * embedding LSH — `Dedup.scala` / `Similarity.scala`) into dedup
  * clusters with one canonical document each. The reference engine has no
  * equivalent (its dedup surface stops at record-level filters); this is
  * part of the training-data extension set (SURVEY "Training-data
  * extensions"), where cluster-then-keep-one is the standard fuzzy-dedup
  * pipeline ending.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — each round
  * is two keyed aggregations + equi-joins, state per node is one (node,
  * label) pair, and convergence is O(log n) rounds even on adversarial
  * chains (min-label propagation alone needs O(diameter)). Nothing is
  * ever collected to the driver; the per-round convergence check is a
  * count + hash-sum aggregate (one scalar action). Lineage is truncated
  * every round so the plan does not grow with the iteration count — the
  * standard Spark iterative-algorithm shape; `reliable = true` uses a
  * durable checkpoint instead of executor-local blocks (see
  * [[connectedComponents]]).
  */
object Components {

  /** Star-contract one side: for each center u, attach its strictly
    * larger neighbors (large-star) or all smaller neighbors plus u
    * itself (small-star) to m = min(N(u) ∪ {u}).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = e.select(col("src"), col("dst"))
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
    val m = nbrs.groupBy(col("src"))
      .agg(min(col("dst")).as("__mn"))
      .select(col("src"), least(col("src"), col("__mn")).as("__m"))
    nbrs.join(m, "src").filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("__m").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(
      greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst"))
    val m = oriented.groupBy(col("src")).agg(min(col("dst")).as("__m"))
    oriented.join(m, "src")
      .select(col("dst").as("src"), col("__m").as("dst"))
      .union(m.select(col("src"), col("__m").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Connected components of the undirected graph given by `pairs`
    * (columns `srcCol`, `dstCol`; any orientation, duplicates fine).
    * Returns `(id, component)` for every node that appears in an edge,
    * where `component` is the minimum node id of its component.
    * Singleton nodes never appear — callers left-join and coalesce to
    * their own id (see [[clusters]]).
    *
    * `reliable = true` swaps the per-round `localCheckpoint` (executor
    * block storage — fast, but an executor loss mid-iteration kills the
    * job) for a reliable `checkpoint` into
    * `spark.sparkContext.getCheckpointDir` — the right choice for long
    * CC runs on a real cluster, where losing an executor over an
    * O(log n)-round job is routine. The caller must have set a
    * checkpoint dir on durable storage first.
    */
  def connectedComponents(pairs: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25,
                          reliable: Boolean = false): DataFrame = {
    // LAZY checkpoint (r16 optimization round): the eager form ran one
    // job to materialize each round's edge set and a SECOND job for the
    // convergence signature right after. Lazily marking the checkpoint
    // lets sig()'s aggregate materialize the blocks in the SAME job —
    // the edge relation is computed exactly once either way (sig scans
    // it once), but each round pays one job/scheduling round-trip
    // instead of two. Lineage is still truncated before the next round
    // builds on it: the returned plan is already a LogicalRDD, and the
    // sig() action (which always follows, below) persists the blocks
    // and drops the RDD lineage.
    def truncate(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint(eager = false)
    var e = truncate(pairs
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct())
    // convergence = edge set stable: (count, order-independent xor of
    // per-edge hashes — the rounds' distinct() makes it a set) — two
    // scalars per round, never edge data on the driver
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(src, dst))")).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var last = sig(e)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val next = truncate(smallStar(largeStar(e)))
      val s = sig(next)
      converged = s == last
      last = s
      e = next
      it += 1
    }
    // post-convergence the edge set is a star forest: src → its
    // component's min id
    e.select(col("src").as("id"), col("dst").as("component"))
  }

  /** Full dedup-cluster assignment: every document gets its component
    * (own id when it has no near-duplicate), the component's size, and
    * an `is_canonical` flag on the member with the minimum id — the row
    * a keep-one-per-cluster pipeline retains.
    *
    * Scale shape: one broadcast-able star-forest join (the CC output has
    * one row per non-root clustered node — far smaller than the corpus)
    * plus one window over `component` bounded by cluster size.
    */
  def clusters(docs: DataFrame, idCol: Column, pairs: DataFrame,
               srcCol: String, dstCol: String): DataFrame = {
    val cc = connectedComponents(pairs, srcCol, dstCol)
    docs.select(idCol.cast("long").as("doc_id"))
      .join(cc, col("doc_id") === col("id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("component"))))
      .withColumn("is_canonical", col("doc_id") === col("component"))
  }

  /** [[clusters]] over a pre-projected per-document relation: `perDoc`
    * carries a long `doc_id` (one row per document) plus any feature
    * columns, which RIDE ALONG through the cluster assignment instead of
    * being re-joined afterwards. This is the fused-curation shape (r17,
    * guide §1.2/§2.3): a pipeline that needs per-doc features alongside
    * the cluster verdict computes them in the SAME corpus scan that
    * feeds the assignment — at 100 TB each avoided project-then-rejoin
    * is a full extra scan plus a join of corpus-sized relations. Output:
    * perDoc's columns + `component`, `cluster_size`, `is_canonical`
    * (same derivation as [[clusters]]).
    */
  def clustersKeeping(perDoc: DataFrame, pairs: DataFrame,
                      srcCol: String, dstCol: String): DataFrame = {
    val cc = connectedComponents(pairs, srcCol, dstCol)
    perDoc
      .join(cc, col("doc_id") === col("id"), "left")
      .drop("id")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("component"))))
      .withColumn("is_canonical", col("doc_id") === col("component"))
  }
}
