package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series as-of join — "for every left row, the most recent right
  * row with the same key at or before it". The classic formulation is a
  * range join (l.key = r.key AND r.ts <= l.ts, keep max r.ts), which a
  * naive planner turns into a per-key quadratic probe; the scalable
  * formulation is the MERGE: union both sides, sort each key's rows once
  * by time, and carry the last-seen right payload forward into the left
  * rows it covers.
  *
  * Scale shape: ONE shuffle (the key partitioning) + one within-
  * partition sort shared by every carried column — Catalyst collapses
  * all the `last(..., ignoreNulls)` calls into a single Window node.
  * There is no join operator at all, so no row multiplication, no
  * range-explode, and a skewed key costs one sort instead of a
  * quadratic probe. This is how kdb/pandas `merge_asof` behave, re-
  * expressed as a Spark window.
  */
object AsofJoin {

  /** Interval (range) join: every (left, right) pair with equal keys
    * whose right timestamp falls in `[left_ts − range, left_ts]` — the
    * "all correlated events in the window" companion to the as-of
    * join's "just the latest". The key equality keeps the physical
    * plan an equi-join (sort-merge/shuffled-hash on the key, the range
    * as a post-join filter) — never a cartesian or a broadcast
    * nested loop. On STREAMS the same condition is Spark's
    * stream-stream join: with watermarks on both sides the time bound
    * doubles as the state-retention bound (each side's buffered rows
    * evict once the other's watermark passes the range), which is what
    * keeps two infinite streams joinable in bounded memory.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: Column, rightKey: Column,
                   leftTs: Column, rightTs: Column,
                   range: String): DataFrame =
    left.join(right,
      leftKey === rightKey &&
        rightTs <= leftTs && rightTs >= leftTs - expr(s"INTERVAL $range"))

  /** Backward (inclusive) as-of join. `left` keeps all its columns;
    * `right` contributes `payload` columns, null where no right row at
    * or before the left row's `ts` exists (LEFT OUTER semantics).
    *
    * Rows of the two sides are interleaved by (`ts`, side) with the
    * right side first at equal timestamps — an exact tie is "at or
    * before", so it matches. Duplicate (key, ts) rows on the RIGHT make
    * "the most recent" ill-defined; pre-aggregate the right side if its
    * timestamps can collide.
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   ts: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(leftCols.contains(key) && leftCols.contains(ts),
      s"left side must carry '$key' and '$ts'")
    payload.foreach(p => require(right.columns.contains(p),
      s"right side missing payload column '$p'"))
    require(payload.forall(p => !leftCols.contains(p)),
      "payload names must not collide with left columns")

    val l = payload.foldLeft(left.withColumn("__side", lit(1))) {
      (d, p) => d.withColumn(p, lit(null).cast(right.schema(p).dataType))
    }
    val rBase = right
      .select((Seq(key, ts) ++ payload).distinct.map(col): _*)
      .withColumn("__side", lit(0))
    val r = leftCols.filterNot(c => c == key || c == ts).foldLeft(rBase) {
      (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val cols = (leftCols ++ payload :+ "__side").distinct
    val u = l.select(cols.map(col): _*)
      .unionByName(r.select(cols.map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    payload.foldLeft(u) { (d, p) =>
        d.withColumn(p, last(col(p), ignoreNulls = true).over(w))
      }
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
