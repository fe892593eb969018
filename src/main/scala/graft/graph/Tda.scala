package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Topological data analysis over sliding metric windows — the
  * clean-room twin of the reference's processor_tda
  * (plugins/processor_tda/tda.c): per group, take the latest
  * `windowSize` feature samples, delay-embed them
  * (tda.c:853-886), build the Euclidean distance matrix, and report
  * persistence-bar counts ("Betti" gauges, tda.c:735-757) at the best
  * of nine quantile-chosen scales (tda.c:808-815 q_candidates,
  * preferring the scale with the most H1 loops, tda.c:945-990).
  *
  * "Betti_k" here follows the reference wrapper EXACTLY
  * (src/ripser/flb_ripser_wrapper.cpp:66-106): the count of FINITE
  * persistence bars of dimension k with persistence ≥ 1e-3 in the
  * Vietoris-Rips filtration capped at the chosen threshold — infinite
  * (essential) bars are skipped, zero-persistence pairs are skipped.
  *
  * The homology core is an original implementation of the standard
  * persistence algorithm (boundary-matrix reduction over GF(2),
  * Edelsbrunner-Letscher-Zomorodian 2002; H0 via union-find): vendored
  * ripser is NOT ported. The window is bounded (reference default 60
  * samples), so per-group state is O(windowSize⁴) simplices at worst —
  * bounded-group compute, the same class as the Lua filter.
  *
  * Scale: groups partition across the cluster; the per-group window is
  * selected relationally (WindowGroupLimit pushes the top-`windowSize`
  * cutoff below the exchange) so only ≤ windowSize rows per group ever
  * reach the reduction. Dimension-2 bars need the tetrahedra×triangle
  * reduction — guarded to n ≤ `maxDim2Points` embedded points (35k×5k
  * bit-matrix at 32; past that B2 reports 0 and `b2_capped` says so).
  */
object Tda {

  /** tda.c:808 — the scales searched for loop structure. */
  val QCandidates: Seq[Double] =
    Seq(0.10, 0.20, 0.30, 0.40, 0.50, 0.60, 0.70, 0.80, 0.90)

  /** flb_ripser_wrapper.cpp:96 MIN_PERSIST. */
  val MinPersist: Double = 1e-3

  /** The shared index rule for every quantile in this module: position
    * floor(q·(m−1)) of a sorted m-element list, no interpolation
    * (tda.c:55-140). Both `thresholdAtQuantile` and the SQL-replayable
    * `tdaThresholds` gate pick through this one function, so the oracle
    * replay (`floor(q*(cnt-1))` in SQL) is pinned to the same IEEE
    * double product.
    */
  def quantileIndex(q: Double, m: Int): Int = {
    val qq = math.max(0.0, math.min(1.0, q))
    math.max(0, math.min(m - 1, (qq * (m - 1)).toInt))
  }

  /** tda.c:55-140 — the q-th entry of the SORTED pairwise distances
    * (index floor(q·(m−1)), no interpolation).
    */
  def thresholdAtQuantile(dist: Array[Array[Double]], q: Double): Double = {
    val n = dist.length
    if (n < 2) return 0.0
    val vals = new Array[Double](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      var j = 0
      while (j < i) { vals(k) = dist(i)(j); k += 1; j += 1 }
      i += 1
    }
    java.util.Arrays.sort(vals)
    vals(quantileIndex(q, vals.length))
  }

  /** Finite-bar counts (b0, b1, b2) of the VR filtration of `dist`
    * capped at `threshold`. `maxDim2Points` guards the tetrahedra
    * reduction (see scaladoc); b2 = 0 beyond it.
    */
  def bettiCounts(dist: Array[Array[Double]], threshold: Double,
                  maxDim2Points: Int = 32): (Int, Int, Int) = {
    val n = dist.length
    if (n < 2) return (0, 0, 0)

    // --- simplices within the cap, in filtration order -----------------
    // edges (i, j) i<j with d ≤ thr, sorted by (diam, i, j)
    val edges = scala.collection.mutable.ArrayBuffer[(Double, Int, Int)]()
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val d = dist(j)(i) max dist(i)(j)
        if (d <= threshold) edges += ((d, i, j))
        j += 1
      }
      i += 1
    }
    val es = edges.sortBy(e => (e._1, e._2, e._3)).toArray
    val edgePos = new java.util.HashMap[Long, Int]()
    var p = 0
    while (p < es.length) {
      edgePos.put(es(p)._2.toLong * n + es(p)._3, p); p += 1
    }
    @inline def epos(a: Int, b: Int): Int =
      edgePos.get((a min b).toLong * n + (a max b))

    // --- H0: union-find over ascending edges ---------------------------
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    var b0 = 0
    // MST membership marks the edges that pair with vertices (H0 killers);
    // the rest are H1 creators
    val inMst = new Array[Boolean](es.length)
    p = 0
    while (p < es.length) {
      val (d, a, b) = es(p)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        parent(ra) = rb
        inMst(p) = true
        if (d - 0.0 >= MinPersist) b0 += 1
      }
      p += 1
    }

    // --- H1: triangles reduce over creator-edge space ------------------
    // triangle diam = max of its three edges (VR); filtration order by
    // (diam, vertex triple)
    val tris = scala.collection.mutable.ArrayBuffer[(Double, Int, Int, Int)]()
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (edgePos.containsKey(i.toLong * n + j)) {
          var k = j + 1
          while (k < n) {
            if (edgePos.containsKey(i.toLong * n + k) &&
                edgePos.containsKey(j.toLong * n + k)) {
              val d = es(epos(i, j))._1 max es(epos(i, k))._1 max
                es(epos(j, k))._1
              if (d <= threshold) tris += ((d, i, j, k))
            }
            k += 1
          }
        }
        j += 1
      }
      i += 1
    }
    val ts = tris.sortBy(t => (t._1, t._2, t._3, t._4)).toArray
    // standard reduction: column = boundary edges as a bitset over edge
    // positions; low = highest set bit; a surviving low pairs the edge
    // (bar birth) with this triangle (bar death)
    var b1 = 0
    val pairedLowToCol = new java.util.HashMap[Int, java.util.BitSet]()
    val triPaired = new Array[Boolean](ts.length)
    var t = 0
    while (t < ts.length) {
      val (d, a, b, c) = ts(t)
      val col = new java.util.BitSet(es.length)
      col.set(epos(a, b)); col.set(epos(a, c)); col.set(epos(b, c))
      var low = col.length - 1
      while (low >= 0 && pairedLowToCol.containsKey(low)) {
        col.xor(pairedLowToCol.get(low))
        low = col.length - 1
      }
      if (low >= 0) {
        pairedLowToCol.put(low, col)
        triPaired(t) = true
        if (!inMst(low) && d - es(low)._1 >= MinPersist) b1 += 1
      }
      t += 1
    }

    // --- H2: tetrahedra reduce over triangle space (guarded) ----------
    var b2 = 0
    if (n <= maxDim2Points && ts.nonEmpty) {
      val triPos = new java.util.HashMap[Long, Int]()
      t = 0
      while (t < ts.length) {
        val (_, a, b, c) = ts(t)
        triPos.put((a.toLong * n + b) * n + c, t); t += 1
      }
      @inline def tpos(a: Int, b: Int, c: Int): Int = {
        val s = Array(a, b, c).sorted
        val v = triPos.get((s(0).toLong * n + s(1)) * n + s(2))
        v
      }
      val paired2 = new java.util.HashMap[Int, java.util.BitSet]()
      // a triangle that CREATED an H1 pair (killed an edge) cannot also
      // create H2; creators here are the triangles left unpaired above
      val tets = scala.collection.mutable.ArrayBuffer[(Double, Int, Int, Int, Int)]()
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          if (edgePos.containsKey(i.toLong * n + j)) {
            var k = j + 1
            while (k < n) {
              if (edgePos.containsKey(i.toLong * n + k) &&
                  edgePos.containsKey(j.toLong * n + k)) {
                var l = k + 1
                while (l < n) {
                  if (edgePos.containsKey(i.toLong * n + l) &&
                      edgePos.containsKey(j.toLong * n + l) &&
                      edgePos.containsKey(k.toLong * n + l)) {
                    val d = Seq(epos(i, j), epos(i, k), epos(i, l),
                      epos(j, k), epos(j, l), epos(k, l))
                      .map(es(_)._1).max
                    if (d <= threshold) tets += ((d, i, j, k, l))
                  }
                  l += 1
                }
              }
              k += 1
            }
          }
          j += 1
        }
        i += 1
      }
      val qs = tets.sortBy(q => (q._1, q._2, q._3, q._4, q._5)).toArray
      var u = 0
      while (u < qs.length) {
        val (d, a, b, c, e) = qs(u)
        val col = new java.util.BitSet(ts.length)
        col.set(tpos(a, b, c)); col.set(tpos(a, b, e))
        col.set(tpos(a, c, e)); col.set(tpos(b, c, e))
        var low = col.length - 1
        while (low >= 0 && paired2.containsKey(low)) {
          col.xor(paired2.get(low))
          low = col.length - 1
        }
        if (low >= 0) {
          paired2.put(low, col)
          // bar: triangle `low` (an H2 creator iff it did not already
          // kill an edge) born at its diam, dies at this tet's diam
          if (!triPaired(low) && d - ts(low)._1 >= MinPersist) b2 += 1
        }
        u += 1
      }
    }
    (b0, b1, b2)
  }

  /** The reference's best-scale sweep (tda.c:945-998): run the nine
    * candidate quantiles, prefer the scale with the most H1 loops;
    * while no loops have been seen, track the best H0. Returns
    * (b0, b1, b2, chosen quantile).
    */
  def bestScale(dist: Array[Array[Double]],
                maxDim2Points: Int = 32): (Int, Int, Int, Double) = {
    var (bestB0, bestB1, bestB2, bestQ) = (0, 0, 0, 0.0)
    for (qc <- QCandidates) {
      val thr = math.max(0.0, thresholdAtQuantile(dist, qc))
      val (t0, t1, t2) = bettiCounts(dist, thr, maxDim2Points)
      if (t1 > bestB1) {
        bestB1 = t1; bestB0 = t0; bestB2 = t2; bestQ = qc
      } else if (bestB1 == 0 && t0 > bestB0) {
        bestB0 = t0; bestB2 = t2; bestQ = qc
      }
    }
    (bestB0, bestB1, bestB2, bestQ)
  }

  /** tda.c:853-916 delay embedding + distance matrix: embedded point p
    * concatenates the feature vectors at sample indices
    * base_p − l·tau, l = 0..m−1, base_p = p + (m−1)·tau; distance is
    * Euclidean over the m·featureDim concatenation.
    */
  def embedDistances(samples: Array[Array[Double]], m: Int,
                     tau: Int): Array[Array[Double]] = {
    val nRaw = samples.length
    val mm = math.max(1, m)
    val tt = if (mm == 1) 1 else math.max(1, tau)
    val nEmbed = nRaw - (mm - 1) * tt
    if (nEmbed < 2) return Array.empty
    val dist = Array.ofDim[Double](nEmbed, nEmbed)
    var i = 0
    while (i < nEmbed) {
      var j = 0
      while (j < i) {
        var acc = 0.0
        var lag = 0
        while (lag < mm) {
          val xi = samples(i + (mm - 1) * tt - lag * tt)
          val xj = samples(j + (mm - 1) * tt - lag * tt)
          var k = 0
          while (k < xi.length) {
            val d = xi(k) - xj(k); acc += d * d; k += 1
          }
          lag += 1
        }
        val d = math.sqrt(acc)
        dist(i)(j) = d; dist(j)(i) = d
        j += 1
      }
      i += 1
    }
    dist
  }

  /** Sliding-window TDA per group over a metric table: one output row
    * per group — (group, n_embed, betti_0, betti_1, betti_2, q_bp,
    * b2_capped) where q_bp is the chosen quantile in basis points
    * (integer, exact) and b2_capped flags windows whose embedded-point
    * count exceeded `maxDim2Points` (their betti_2 is reported 0, the
    * tetrahedra reduction was skipped).
    *
    * The latest `windowSize` samples per group are selected with a
    * rank window (WindowGroupLimit bounds it below the exchange), so
    * the per-group reduction input is bounded by construction — the
    * relational twin of tda.c's ring buffer.
    */
  def tdaWindows(df: DataFrame, group: Column, tsNs: Column,
                 features: Seq[Column], windowSize: Int = 60,
                 embedDim: Int = 1, embedDelay: Int = 1,
                 minPoints: Int = 8, maxDim2Points: Int = 32): DataFrame = {
    require(windowSize <= 256,
      s"windowSize=$windowSize: the reduction is O(window⁴) simplices — " +
        "the reference's ring buffer defaults to 60; cap at 256")
    val spark = df.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("g")).orderBy(col("tn").desc)
    val windowed = df.select(group.cast("string").as("g"),
        tsNs.cast("long").as("tn"),
        array(features.map(_.cast("double")): _*).as("fv"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= windowSize)
      .groupBy(col("g"))
      .agg(sort_array(collect_list(struct(col("tn"), col("fv"))))
        .as("win"))
    windowed.select(col("g"), col("win"))
      .as[(String, Seq[(Long, Seq[Double])])]
      .map { case (g, win) =>
        val samples = win.map(_._2.toArray).toArray
        if (samples.length < minPoints) (g, 0, 0, 0, 0, 0L, false)
        else {
          val dist = embedDistances(samples, embedDim, embedDelay)
          if (dist.length < 2) (g, dist.length, 0, 0, 0, 0L, false)
          else {
            val (b0, b1, b2, q) = bestScale(dist, maxDim2Points)
            (g, dist.length, b0, b1, b2, math.round(q * 10000),
              dist.length > maxDim2Points)
          }
        }
      }
      .toDF("series", "n_embed", "betti_0", "betti_1", "betti_2", "q_bp",
        "b2_capped")
  }

  /** The SQL-replayable half of the TDA pipeline, integer-exact for the
    * oracle gate: per group, select the latest `windowSize` samples of a
    * single LONG feature (ordered (ts, value) for a deterministic
    * window), delay-embed (m, tau), and report the SQUARED pairwise
    * embedded distances at quantiles 0.10/0.50/0.90 — squared keeps
    * every value an exact integer (no sqrt at the gate boundary), and
    * the quantile picks through `quantileIndex`, the same index rule
    * `thresholdAtQuantile` uses for the homology sweep.
    *
    * Output: (series, n_embed, n_pairs, d2_q10, d2_q50, d2_q90), one
    * row per group with ≥ 2 embedded points.
    *
    * Scale: identical shape to `tdaWindows` — WindowGroupLimit bounds
    * the per-group input to `windowSize` rows below the exchange; the
    * pair expansion is in-group, ≤ windowSize²/2 values, never a join.
    */
  def tdaThresholds(df: DataFrame, group: Column, tsNs: Column,
                    feature: Column, windowSize: Int = 60,
                    embedDim: Int = 3, embedDelay: Int = 2): DataFrame = {
    require(windowSize <= 256, s"windowSize=$windowSize: cap at 256")
    val spark = df.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("g"))
      .orderBy(col("tn").desc, col("v").desc)
    val windowed = df.select(group.cast("string").as("g"),
        tsNs.cast("long").as("tn"), feature.cast("long").as("v"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= windowSize)
      .groupBy(col("g"))
      .agg(sort_array(collect_list(struct(col("tn"), col("v"))))
        .as("win"))
    val mm = math.max(1, embedDim)
    val tt = if (mm == 1) 1 else math.max(1, embedDelay)
    windowed.as[(String, Seq[(Long, Long)])]
      .flatMap { case (g, win) =>
        val s = win.map(_._2).toArray
        val nEmbed = s.length - (mm - 1) * tt
        if (nEmbed < 2) Iterator.empty
        else {
          val d2 = new Array[Long](nEmbed * (nEmbed - 1) / 2)
          var k = 0
          var i = 0
          while (i < nEmbed) {
            var j = i + 1
            while (j < nEmbed) {
              var acc = 0L
              var lag = 0
              while (lag < mm) {
                val d = s(i + lag * tt) - s(j + lag * tt)
                acc += d * d
                lag += 1
              }
              d2(k) = acc; k += 1; j += 1
            }
            i += 1
          }
          java.util.Arrays.sort(d2)
          Iterator.single((g, nEmbed.toLong, d2.length.toLong,
            d2(quantileIndex(0.10, d2.length)),
            d2(quantileIndex(0.50, d2.length)),
            d2(quantileIndex(0.90, d2.length))))
        }
      }
      .toDF("series", "n_embed", "n_pairs", "d2_q10", "d2_q50", "d2_q90")
  }
}
