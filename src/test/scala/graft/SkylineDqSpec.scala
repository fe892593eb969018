package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skyline

/** Round-13 batch-2 operators: two-phase skyline, DQ constraint suite,
  * table diff, t-closeness, autocorrelation.
  */
class SkylineDqSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // --------------------------------------------------------- skyline2d

  test("skyline2d keeps exactly the non-dominated rows") {
    // minimize x, maximize y
    val df = Seq(
      (1L, 10L, 50L), // skyline (cheapest of the y=50 pair)
      (2L, 10L, 40L), // dominated by 1 (same x, smaller y)
      (3L, 20L, 50L), // dominated by 1 (same y, dearer)
      (4L, 20L, 60L), // skyline
      (5L, 30L, 70L), // skyline
      (6L, 25L, 55L)  // dominated by 4
    ).toDF("id", "x", "y").repartition(3)
    val got = Skyline.skyline2d(df, "x", "y")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 4L, 5L))
  }

  test("skyline2d keeps exact (x, y) duplicates of a skyline row") {
    val df = Seq(
      (1L, 10L, 50L), (2L, 10L, 50L), // tied pair, both skyline
      (3L, 15L, 50L),                 // dominated by the pair
      (4L, 5L, 10L)                   // skyline (cheapest overall)
    ).toDF("id", "x", "y").repartition(4)
    val got = Skyline.skyline2d(df, "x", "y")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 4L))
  }

  test("skyline2d output is partition-independent") {
    val rows = (1L to 200L).map(i => (i, i % 37, (i * 7) % 53))
    val a = Skyline.skyline2d(rows.toDF("id", "x", "y").repartition(1),
      "x", "y").select("id").as[Long].collect().sorted.toSeq
    val b = Skyline.skyline2d(rows.toDF("id", "x", "y").repartition(7),
      "x", "y").select("id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
    // spot-check against the O(n²) definition
    val naive = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, x2, y2) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y) }
    }.map(_._1).sorted
    assert(a == naive)
  }

  // ------------------------------------------------- gate sanity checks

  test("x_dq_constraints: five verdict rows, all counters exercised") {
    val out = graft.queries.Registry.queries("x_dq_constraints")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size == 5)
    assert(out.values.forall(_ > 0)) // the dirtying injected every class
  }

  test("x_table_diff reports the injected statuses") {
    val st = graft.queries.Registry.queries("x_table_diff")(spark, sf)
      .groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st.keySet == Set("added", "removed", "changed"))
  }

  test("x_tcloseness: a skewed class fails, a matching class passes") {
    // hand-built: global = 50/50 over bands {0,1}; class A matches
    // (EMD 0), class B is all-band-0 (EMD 1/2 > 0.2)
    import org.apache.spark.sql.expressions.Window
    val o = (Seq.fill(10)(("A", 0L)) ++ Seq.fill(10)(("A", 1L)) ++
      Seq.fill(10)(("B", 0L)) ++ Seq.fill(10)(("X", 1L)))
      .toDF("cls", "band")
    // inline re-derivation of the gate's math at m=2
    val cc = o.groupBy("cls", "band").agg(count(lit(1)).as("c"))
    val grid = cc.select("cls").distinct()
      .crossJoin(spark.range(0, 2).select(col("id").as("band")))
      .join(cc, Seq("cls", "band"), "left")
      .select(col("cls"), col("band"), coalesce(col("c"), lit(0L)).as("c"))
    val wC = Window.partitionBy("cls").orderBy("band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid.withColumn("cum_c", sum(col("c")).over(wC))
      .withColumn("n_rows",
        sum(col("c")).over(Window.partitionBy("cls")))
    val g = o.groupBy("band").agg(count(lit(1)).as("g"))
      .withColumn("cum_g", sum(col("g")).over(
        Window.orderBy("band").rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
    val res = cum.join(g.select("band", "cum_g"), Seq("band"))
      .filter(col("band") < 1)
      .withColumn("emd_num",
        abs(col("cum_c") * lit(40L) - col("cum_g") * col("n_rows")))
      .select("cls", "emd_num", "n_rows")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // A: |10*40 - 20*20| = 0; B: |10*40 - 20*10| = 200 -> EMD = 200/(20*40) = 1/4
    assert(res("A") == 0L)
    assert(res("B") == 200L)
    // verdict at t=0.2, m=2: 5*emd > 1*n*N -> 1000 > 800 fails B, passes A
    assert(res("B") * 5 > 20L * 40L && res("A") * 5 <= 20L * 40L)
  }

  test("x_series_acf: alternating series has acf(1) = -1, acf(2) = +1") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy("i")
    val df = (0L until 40L).map(i => ("s", i, if (i % 2 == 0) 100L else 200L))
      .toDF("k", "i", "x")
      .select(col("k"), col("x"),
        lead(col("x"), 1).over(w).as("x1"),
        lead(col("x"), 2).over(w).as("x2"))
    val d = "decimal(38,0)"
    def acf(yc: String) = {
      val a = df.filter(col(yc).isNotNull)
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(d)).as("sx"),
          sum(col(yc).cast(d)).as("sy"),
          sum((col("x") * col(yc)).cast(d)).as("sxy"),
          sum((col("x") * col("x")).cast(d)).as("sxx"),
          sum((col(yc) * col(yc)).cast(d)).as("syy"))
      a.select(((col("n").cast(d) * col("sxy") - col("sx") * col("sy"))
        .cast("double") /
        (sqrt((col("n").cast(d) * col("sxx") - col("sx") * col("sx"))
          .cast("double")) *
          sqrt((col("n").cast(d) * col("syy") - col("sy") * col("sy"))
            .cast("double")))).as("r"))
        .collect()(0).getDouble(0)
    }
    assert(math.abs(acf("x1") - (-1.0)) < 1e-12)
    assert(math.abs(acf("x2") - 1.0) < 1e-12)
  }

  test("hllSlidingEstimate: merged pane sketches equal the direct sketch") {
    import graft.sketch.Sketches
    // keys spread over panes 0..2; the window ending at pane 2 merges
    // all three pane sketches and must equal the direct estimate over
    // the union, because register max is associative
    val rows = (1L to 300L).map(k => ("s", k % 3, k)).toDF("g", "pane", "k")
    val sliding = Sketches.hllSlidingEstimate(rows, col("g"), col("pane"),
        col("k"), panes = 3)
      .filter(col("win") === 2L).select("est").as[Long].collect()
    val direct = Sketches.hllGroupedEstimate(rows, col("g"), col("k"))
      .select("est").as[Long].collect()
    assert(sliding.toSeq == direct.toSeq)
    // the window covering only pane 0 equals the pane-0-only sketch
    val w0 = Sketches.hllSlidingEstimate(rows, col("g"), col("pane"),
        col("k"), panes = 3)
      .filter(col("win") === 0L).select("est").as[Long].collect()
    val p0 = Sketches.hllGroupedEstimate(rows.filter(col("pane") === 0L),
        col("g"), col("k")).select("est").as[Long].collect()
    assert(w0.toSeq == p0.toSeq)
  }

  test("hllSlidingEstimate: pane gaps emit only windows containing a pane") {
    import graft.sketch.Sketches
    // panes {0, 5}: windows = {0,1,2} ∪ {5,6,7}, nothing for 3/4 —
    // the streaming twin must agree (its flush skips empty windows)
    val rows = (1L to 100L).map(k => ("s", if (k % 2 == 0) 0L else 5L, k))
      .toDF("g", "pane", "k")
    val wins = Sketches.hllSlidingEstimate(rows, col("g"), col("pane"),
        col("k"), panes = 3)
      .select("win").as[Long].collect().sorted.toSeq
    assert(wins == Seq(0L, 1L, 2L, 5L, 6L, 7L))
  }

  test("replay harness hygiene: sink view dropped, partitions restored") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val df = graft.queries.Registry.queries("x_dedup_exact_stream")(spark, sf)
    assert(df.count() > 0)
    // takeSink restored the pinned shuffle partitioning...
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    // ...and dropped the memory-sink temp view from the catalog
    val leftover = spark.catalog.listTables().collect()
      .filter(_.name.startsWith("x_dedup_exact_stream"))
    assert(leftover.isEmpty, leftover.map(_.name).toSeq.toString)
  }
}
