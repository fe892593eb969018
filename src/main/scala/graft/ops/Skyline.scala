package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto front): the rows not dominated on a
  * (minimize, maximize) criteria pair. Row `a` dominates row `b` when
  * `a.min <= b.min && a.max >= b.max` with at least one inequality
  * strict; the skyline is every row nothing dominates — the classic
  * "cheapest for its quality class" cut (price vs size, latency vs
  * throughput, cost vs coverage).
  *
  * Scale shape — the textbook two-phase distributed skyline:
  *   1. partition-local skyline: `sortWithinPartitions(min asc, max
  *      desc)` (Tungsten sort, spillable) then a streaming one-pass
  *      dominance scan in `mapPartitions` — O(1) memory, prunes every
  *      partition down to its local Pareto set;
  *   2. global skyline: the surviving union (skyline-sized, tiny by
  *      construction) repartitioned to one task and scanned once more
  *      with the identical kernel.
  * Dominance is transitive, so a globally non-dominated row is never
  * pruned locally and phase 2's output is exactly the true skyline,
  * independent of the input partitioning. Nothing shuffles except the
  * phase-1 survivors; no all-pairs comparison ever happens (the oracle's
  * NOT EXISTS anti-join is the O(n²) form this operator avoids).
  *
  * Ties: rows with identical (min, max) values do not dominate each
  * other and are all kept (or all pruned by a third dominator) — the
  * scan tracks the (min, max) pair that set the running best so exact
  * duplicates of a kept row survive.
  */
object Skyline {

  /** Skyline of `df` minimizing LONG column `minCol` and maximizing LONG
    * column `maxCol`; all other columns ride along as payload.
    */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    // NULL in either coordinate has no dominance order — such rows are
    // excluded up front (also keeps the primitive getLong kernel below
    // NPE-safe; without this a single NULL row throws at runtime)
    val clean = df.filter(col(minCol).isNotNull && col(maxCol).isNotNull)
    val enc = Encoders.row(df.schema)
    val mi = df.schema.fieldIndex(minCol)
    val ma = df.schema.fieldIndex(maxCol)
    // one-pass dominance kernel over a (min asc, max desc)-sorted slice:
    // keep a row iff its max beats every strictly-cheaper row's max, or
    // it exactly ties the row that currently holds the best max
    def scan(it: Iterator[Row]): Iterator[Row] = new Iterator[Row] {
      // `started` keeps the sentinel out of band: a first row whose max
      // IS Long.MinValue is still trivially non-dominated and must pass
      private var started = false
      private var bestMax = Long.MinValue
      private var bestMin = Long.MinValue
      private var nextRow: Row = null
      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && it.hasNext) {
          val r = it.next()
          val (x, y) = (r.getLong(mi), r.getLong(ma))
          if (!started || y > bestMax) {
            started = true; bestMax = y; bestMin = x; nextRow = r
          } else if (y == bestMax && x == bestMin) nextRow = r
        }
      }
      advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): Row = { val r = nextRow; advance(); r }
    }
    val local = clean
      .sortWithinPartitions(col(minCol).asc, col(maxCol).desc)
      .mapPartitions(scan)(enc)
    local
      .repartition(1)
      .sortWithinPartitions(col(minCol).asc, col(maxCol).desc)
      .mapPartitions(scan)(enc)
  }
}
