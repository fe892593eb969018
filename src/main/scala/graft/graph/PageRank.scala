package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank over an edge list — link-graph authority scoring
  * for crawl curation (OPIC/Common-Crawl-style frontier prioritization;
  * the same join-iterate spine as [[graft.dedup.Components]]'
  * star-contraction loop).
  *
  * Arithmetic is integer fixed-point at scale 10⁶ with damping 0.85:
  * r₀ = 10⁶; rᵢ₊₁ = 150000 + (850000·Σ(rᵢ div deg)) div 10⁶ — every
  * operation is integer division, so results replay bit-for-bit in any
  * engine (no float accumulation order to diverge).
  *
  * Scale: each iteration is one (src-keyed) contribution join + one
  * dst-keyed sum — the standard Pregel message pattern expressed as
  * DataFrame joins; AQE handles hub skew (a hot dst is one skewed
  * reduce key, splittable). Iterations deepen lineage linearly; for
  * long runs callers should insert `localCheckpoint()` every ~10
  * rounds exactly as Components does for star contraction. Ranks and
  * degrees are O(|V|) DataFrames — nothing touches the driver.
  */
object PageRank {

  /** @param edges  (src, dst) long columns, multi-edges allowed
    * @param nodes  single-column (id) universe (isolated nodes get base)
    * @param iters  fixed iteration count
    */
  def run(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = edges.join(deg, "src")
    var ranks = nodes.select(col("id"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks, e("src") === ranks("id"))
        .select(col("dst"), expr("r div deg").as("c"))
      val sums = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes.select(col("id"))
        .join(sums, nodes("id") === sums("dst"), "left")
        .select(col("id"),
          // the damped product is formed in DECIMAL(38,0): a hub whose
          // summed contributions exceed ~1.08e13 (in-degree ~1e7 at full
          // rank — plausible at 100 TB) would silently wrap Long under
          // 850000·s; `div` on decimals floors back to BIGINT exactly
          (lit(150000L) +
            expr("(850000 * cast(coalesce(s, 0L) as decimal(38,0)))" +
              " div 1000000")).as("r"))
    }
    ranks.select(col("id"), col("r").as("rank_fp"))
  }
}
