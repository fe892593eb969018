package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles over a BOUNDED-cardinality value domain —
  * the observability percentile path (p50/p90/p99/p999 of a latency or
  * size column that is integral or pre-bucketed, as the reference's
  * log_to_metrics histogram mode buckets it).
  *
  * Shape: ONE value-keyed count aggregate collapses the corpus to its
  * histogram (map-side combine makes the shuffle ≤ |domain| rows per
  * partition), then a window cumulative-sum over the |domain|-row
  * histogram finds the smallest value whose cumulative count reaches
  * each target rank. The window is single-partition BY CONSTRUCTION —
  * it sorts the histogram, never the data; that is exactly why this is
  * exact AND scale-free for bounded domains, where a global data sort
  * would be the naive formulation. Continuous domains must quantize
  * first (then this returns exact quantiles of the quantized
  * distribution); unbounded-cardinality exact quantiles at 100 TB do
  * not exist without a sort — that is what sketches are for.
  *
  * Ranks are computed entirely in integers: `needed = ⌈N·num/den⌉ =
  * (N·num + den − 1) div den` — replayable bit-exactly by any engine.
  */
object Quantiles {

  val DefaultQs: Seq[(String, Int, Int)] =
    Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100), ("p999", 999, 1000))

  /** Per-group exact quantiles — p50/p99 latency PER SERVICE, the shape
    * observability actually queries. Identical histogram-cumsum spine,
    * but the window partitions by the group key, so histogram rows
    * spread across the cluster by group and no single-partition sort
    * exists anywhere: scale-out follows the group count.
    */
  def groupedQuantiles(df: DataFrame, group: Column, value: Column,
                       qs: Seq[(String, Int, Int)] = DefaultQs): DataFrame = {
    val counts = df.groupBy(group.as("g"), value.cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("total", sum(col("cnt")).over(wAll))
      .select(col("g"), col("v"), col("cum"), col("total"),
        explode(typedLit(qs)).as("q"))
      .withColumn("needed", expr("(total * q._2 + q._3 - 1) div q._3"))
      .filter(col("cum") >= col("needed"))
      .groupBy(col("g"), col("q._1").as("q"))
      .agg(min(col("needed")).as("rank_needed"), min(col("v")).as("value"))
      .select(col("g"), col("q"), col("rank_needed"), col("value"))
  }

  /** Two-key grouped exact quantiles — the (service, time-bucket) grain
    * of a latency heatmap. Same histogram-cumsum spine as
    * [[groupedQuantiles]]; the window partitions by BOTH keys, so the
    * histogram spreads by series·bucket and parallelism follows the
    * heatmap's cell count.
    */
  def groupedQuantiles2(df: DataFrame, g1: Column, g2: Column,
                        value: Column,
                        qs: Seq[(String, Int, Int)]): DataFrame = {
    val counts = df
      .groupBy(g1.as("g1"), g2.as("g2"), value.cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("g1"), col("g2")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("g1"), col("g2")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("total", sum(col("cnt")).over(wAll))
      .select(col("g1"), col("g2"), col("v"), col("cum"), col("total"),
        explode(typedLit(qs)).as("q"))
      .withColumn("needed", expr("(total * q._2 + q._3 - 1) div q._3"))
      .filter(col("cum") >= col("needed"))
      .groupBy(col("g1"), col("g2"), col("q._1").as("q"))
      .agg(min(col("needed")).as("rank_needed"), min(col("v")).as("value"))
      .select(col("g1"), col("g2"), col("q"), col("rank_needed"),
        col("value"))
  }

  /** Global exact quantiles. The histogram's boundedness is now
    * ENFORCED (r9 verdict: nothing checked it): [[BoundedGlobal.bounded]]
    * fails loudly past `cap` distinct values instead of silently
    * serializing an unbounded domain through the one-partition window.
    */
  def exactQuantiles(df: DataFrame, value: Column,
                     qs: Seq[(String, Int, Int)] = DefaultQs,
                     cap: Int = BoundedGlobal.DefaultCap): DataFrame = {
    val counts = BoundedGlobal.bounded(
      df.groupBy(value.cast("long").as("v")).agg(count(lit(1)).as("cnt")),
      "Quantiles.exactQuantiles", cap)
    counts
      .withColumn("cum", sum(col("cnt")).over(BoundedGlobal.cumFrame(col("v"))))
      .withColumn("total",
        sum(col("cnt")).over(BoundedGlobal.totalFrame(col("v"))))
      .select(col("v"), col("cum"), col("total"),
        explode(typedLit(qs)).as("q"))
      .withColumn("needed", expr("(total * q._2 + q._3 - 1) div q._3"))
      .filter(col("cum") >= col("needed"))
      .groupBy(col("q._1").as("q"))
      .agg(min(col("needed")).as("rank_needed"), min(col("v")).as("value"))
      .select(col("q"), col("rank_needed"), col("value"))
  }
}
