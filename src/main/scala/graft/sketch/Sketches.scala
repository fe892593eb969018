package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic summary sketches for high-cardinality streams — the
  * "novel sketch" slot of SURVEY §4.3's custom-operator ladder, done at
  * preference level (a): composed from built-in aggregates, with the
  * trained table carried as literal model state like the k-means
  * centroids and DSIR buckets.
  */
object Sketches {

  /** Count-min sketch (Cormode & Muthukrishnan 2005): `d` hash rows ×
    * `w` counters summarize token frequencies in ONE corpus aggregate
    * whose key cardinality is bounded by d·w — at any corpus size the
    * shuffle moves at most d·w·partitions partial rows, and the sketch
    * itself (d·w longs, 32 KB at the defaults) collects as driver model
    * state. `estimate(t) = min_r cms[r][h_r(t)]` NEVER under-counts
    * (each cell only ever adds other tokens' collisions), which is the
    * property the gate asserts row-by-row against exact counts.
    *
    * Row hashes are md5 with the row index as a salt in the hashed
    * string — the repo's reproducible-seed pattern, replayable by any
    * engine.
    */
  /** The sketch's cell aggregation as a DataFrame — `(r, b, c)` rows,
    * key cardinality ≤ d·w. On a STREAMING input this is the sketch as
    * state: the state store holds at most d·w counters regardless of
    * stream volume, and every micro-batch's tokens fold in by cell-wise
    * addition (count-min is a linear sketch, so micro-batch merge IS
    * the sketch merge).
    */
  def countMinCells(df: DataFrame, text: Column, d: Int = 4,
                    w: Int = 1024): DataFrame =
    df.select(explode(split(text, " ")).as("tok"))
      .select(col("tok"),
        explode(typedLit((0 until d).toArray)).as("r"))
      .groupBy(col("r"),
        (conv(substring(md5(concat(col("tok"), lit("#"),
          col("r").cast("string"))), 1, 8), 16, 10).cast("long") % w)
          .as("b"))
      .agg(count(lit(1)).as("c"))

  def countMinBuild(df: DataFrame, text: Column, d: Int = 4,
                    w: Int = 1024): Array[Array[Long]] = {
    val rows = countMinCells(df, text, d, w).collect()
    val cms = Array.fill(d, w)(0L)
    rows.foreach(r => cms(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2))
    cms
  }

  /** Point-query the sketch for every token of a (small) probe set and
    * compare with the exact corpus counts: output
    * (token, est, true_cnt, ok) where `ok` asserts the one-sided
    * error bound est ≥ true. Estimation is a map-only projection
    * against the literal sketch; the exact counts are the expensive
    * comparator a sketch exists to avoid — here they double as the
    * oracle's ground truth.
    */
  def countMinEstimate(df: DataFrame, text: Column, probe: DataFrame,
                       cms: Array[Array[Long]]): DataFrame = {
    val d = cms.length
    val w = cms(0).length
    val trueCounts = df
      .select(explode(split(text, " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("true_cnt"))
    def cell(r: Int): Column =
      element_at(typedLit(cms(r)),
        (conv(substring(md5(concat(col("token"), lit("#"), lit(r.toString))),
          1, 8), 16, 10).cast("long") % w).cast("int") + 1)
    val est = least((0 until d).map(cell): _*)
    trueCounts
      .join(broadcast(probe.select(col("token")).distinct()), "token")
      .withColumn("est", est)
      .select(col("token"), col("est"), col("true_cnt"),
        (col("est") >= col("true_cnt")).as("ok"))
  }
}
