package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{dotProduct, l2Norm}

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`/`Array[Double]`) — north-star extension (BASELINE.json).
  *
  * Scale design: the brute-force path broadcasts the (small) query set
  * and streams the candidate corpus — a map-only plan, no shuffle of the
  * corpus; dot products run through the codegen'd [[graft.functions.DotProduct]]
  * expression (a primitive loop inside WholeStageCodegen, not an
  * interpreted higher-order lambda), and each side's norm is computed
  * once, not once per pair. Top-k selection is two-phase (per-partition
  * partial top-k, then a tiny merge) so no executor ever sorts the full
  * score set and low-cardinality query ids cause no shuffle skew. The
  * LSH path buckets vectors by random-hyperplane signatures so candidate
  * generation is an equi-join on (bucket), which partitions evenly at
  * any corpus size.
  */
object Similarity {

  /** dot(a, b) — codegen'd Catalyst expression. */
  def dot(a: Column, b: Column): Column = dotProduct(a, b)

  def norm(a: Column): Column = l2Norm(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Per-group top-k with bounded executor state: `row_number()` over
    * (group, orderAsc..) + `rank <= k`. Catalyst's InferWindowGroupLimit
    * rewrites this to WindowGroupLimit in BOTH partial (pre-shuffle) and
    * final mode, so every partition keeps at most k rows per group in a
    * size-k heap — unlike a `collect_list`-based top-k, whose partial
    * aggregation buffers EVERY candidate of a hot group in executor
    * memory before slicing (the round-3 scale defect). Orders by
    * (orderAsc..) ascending; emits rank 1..k.
    */
  private def topKPerGroup(scored: DataFrame, groupCol: String, k: Int,
                           payload: Seq[String], orderAsc: Seq[Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(orderAsc: _*)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select((col(groupCol) +: payload.map(col)) :+ col("rank"): _*)
  }

  /** Brute-force top-k cosine neighbors of each query vector.
    * `queries` must be small (it is broadcast); ranking uses the rounded
    * cosine + id tiebreak so results are reproducible across engines.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv"))))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = q.join(c, col("qid") =!= col("cid"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 3))
      .select("qid", "cid", "cos")
    topKPerGroup(scored, "qid", k,
      payload = Seq("cid", "cos"),
      orderAsc = Seq(negate(col("cos")).as("__negcos"), col("cid").as("__cid")))
      .select(col("qid"), col("cid"), col("cos"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * derived from md5 so any engine reproduces the same planes —
    * hex char code mapped to a signed weight. Computed DRIVER-SIDE into
    * literal arrays: the equivalent Column formula
    * (`transform(sequence(...), d -> ascii(substr(md5(...))))`) is a
    * higher-order lambda Catalyst does NOT constant-fold, so it ran 2M
    * interpreted md5 calls per 2k-vector corpus in round 2.
    */
  def planeWeight(plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${plane}_$dim".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (hex.charAt(0).toInt - 80).toDouble
  }

  /** The full plane as a literal weight vector. */
  def planeWeights(plane: Int, dims: Int): Array[Double] =
    (0 until dims).map(d => planeWeight(plane, d)).toArray

  /** Random-hyperplane LSH signature (`nPlanes` sign bits) per vector:
    * `nPlanes` codegen'd dot products against literal plane vectors.
    */
  def lshSignature(df: DataFrame, idCol: String, vecCol: String,
                   nPlanes: Int, dims: Int): DataFrame = {
    val sigBits = (0 until nPlanes).map { p =>
      when(dot(col(vecCol), lit(planeWeights(p, dims))) >= 0, lit("1"))
        .otherwise(lit("0"))
    }
    df.select(col(idCol), concat(sigBits: _*).as("lsh_sig"))
  }

  /** IVF coarse quantization: assign every vector to its
    * highest-cosine centroid (ties broken by centroid id). `centroids`
    * must be small (broadcast); assignment is a map-only scan of the
    * corpus plus a tiny two-phase argmax — the standard inverted-file
    * layout where a later query searches only its cell.
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame, idCol: String,
                vecCol: String): DataFrame = {
    val cent = broadcast(centroids
      .select(col(idCol).as("cent_id"), col(vecCol).as("cv"))
      .withColumn("cn", norm(col("cv"))))
    val v = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("ev"))
      .withColumn("vn", norm(col("ev")))
    val scored = v.join(cent, lit(true))
      .withColumn("cos", round(dot(col("ev"), col("cv")) / (col("vn") * col("cn")), 6))
      .select("vec_id", "cent_id", "cos")
    topKPerGroup(scored, "vec_id", 1,
      payload = Seq("cent_id"),
      orderAsc = Seq(negate(col("cos")).as("__negcos"), col("cent_id").as("__cid")))
      .select(col("vec_id"), col("cent_id").as("cell"))
  }

  /** IVF centroid training: Lloyd's k-means iterations as DataFrame
    * aggregations. Init is deterministic (the k vectors with id < k, in
    * id order) so an external engine can replay training bit-for-bit;
    * assignment reuses [[ivfAssign]]'s rounded-cosine + id tiebreak, and
    * the centroid update computes each component as
    * `CAST(decimal_sum AS DOUBLE) / count` (the repo's exact-sum
    * determinism rule) — cosine assignment is scale-invariant, so the
    * un-normalized mean gives the same cells spherical k-means would.
    *
    * Scale shape per iteration: ONE job — a map-only argmax against the
    * k literal centroids fused into a HashAggregate on `cell` carrying
    * `dim` decimal partial sums with map-side combine (the same
    * wide-aggregate shape as MinHash k=128). Only the k×dim centroid
    * matrix crosses the driver between rounds — model state, not record
    * data, exactly like MLlib's KMeans.
    *
    * Returns `(cent_id, cv array<double>)`; empty cells drop out, as in
    * the reference Lloyd formulation.
    */
  def kmeansTrain(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
                  iters: Int, dim: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    kmeansTrainModel(vecs, idCol, vecCol, k, iters, dim)
      .toSeq.map { case (id, cv) => (id, cv.toSeq) }
      .toDF("cent_id", "cv")
  }

  /** [[kmeansTrain]] returning the raw driver-held model (k×dim centroid
    * matrix) so callers can fuse a final assignment pass against literal
    * centroids without re-collecting.
    */
  def kmeansTrainModel(vecs: DataFrame, idCol: String, vecCol: String,
                       k: Int, iters: Int, dim: Int): Array[(Long, Array[Double])] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val base = vecs.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("ev"))
    // Centroids are k×dim MODEL STATE, not record data: they live on the
    // driver between rounds (the canonical Lloyd shape — Spark MLlib's
    // KMeans does the same collect per iteration). This keeps each
    // iteration to ONE job: a map-only argmax against literal centroids
    // fused with the mean-update HashAggregate — no window, no join, no
    // broadcast exchange, no lineage growth.
    var cents: Array[(Long, Array[Double])] =
      base.filter(col("vec_id") < k).as[(Long, Seq[Double])]
        .collect().sortBy(_._1).map { case (id, v) => (id, v.toArray) }
    var it = 0
    while (it < iters) {
      // argmax over k literal centroids: array_max on struct(cos,
      // -cent_id) replays ivfAssign's (round(cos,6) desc, cent_id asc)
      // rank-1 exactly — struct ordering breaks cosine ties toward the
      // larger negid = smaller cent_id
      val scored = array(cents.map { case (id, cv) =>
        val cn = math.sqrt(cv.map(x => x * x).sum)
        struct(
          round(dot(col("ev"), typedLit(cv)) / (col("__vn") * lit(cn)), 6)
            .as("cos"),
          lit(-id).as("negid"))
      }: _*)
      val cell = (-array_max(scored).getField("negid")).as("cell")
      // Exact-sum determinism via fixed-point LONG accumulators (scale
      // 1e9): decimal(38,12) sums are BigDecimal-backed and cost ~7× a
      // primitive sum in the 64-wide aggregate; quantizing each
      // component to 9 decimals first makes the sum exact integer math
      // that any engine replays bit-for-bit, and keeps headroom for
      // ~10^9-row cells before overflow.
      // floor(x·1e9 + 0.5): same fixed-point quantization, but floor
      // stays primitive in codegen where round() detours through
      // BigDecimal per value; the oracle uses the identical formula
      val sums = (0 until dim).map(i =>
        sum(floor(element_at(col("ev"), i + 1) * 1e9 + 0.5)).as(s"__s$i"))
      val agg = base.withColumn("__vn", norm(col("ev")))
        .select(cell, col("ev"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("__n"), sums: _*)
        .select(col("cell"), col("__n").as("__n"),
          array((0 until dim).map(i => col(s"__s$i")): _*).as("__sums"))
      cents = agg.as[(Long, Long, Seq[Long])].collect()
        .sortBy(_._1)
        .map { case (id, n, s) =>
          (id, s.map(x => x.toDouble / 1e9 / n).toArray)
        }
      it += 1
    }
    cents
  }

  /** Assign every vector to its nearest trained centroid AND emit the
    * cosine — ONE map-only job against the k literal centroids (the same
    * fused argmax shape as a training iteration), replacing the
    * ivfAssign → join(base) → broadcast-join(centroids) three-plan tail:
    * no shuffle, no join, nothing but the scan.
    *
    * Tie-breaking replays [[ivfAssign]]'s (round(cos,6) desc, cent_id
    * asc) rank-1 exactly via the struct-max trick.
    */
  def kmeansAssign(vecs: DataFrame, idCol: String, vecCol: String,
                   model: Array[(Long, Array[Double])]): DataFrame = {
    val base = vecs.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("ev"))
      .withColumn("__vn", norm(col("ev")))
    val scored = array(model.map { case (id, cv) =>
      val cn = math.sqrt(cv.map(x => x * x).sum)
      struct(
        round(dot(col("ev"), typedLit(cv)) / (col("__vn") * lit(cn)), 6)
          .as("cos"),
        lit(-id).as("negid"))
    }: _*)
    val best = array_max(scored)
    base.select(col("vec_id"),
      (-best.getField("negid")).as("cell"),
      best.getField("cos").as("cos"))
  }

  /** Scalar-quantized (int8-range) top-k search — the memory-compressed
    * ANN path: per-dimension min/max ranges quantize every component to
    * 0..255 and PACK it as one byte per dimension (`BinaryType`), so a
    * 64-dim vector really is 64 bytes instead of a 528-byte double
    * array — the honest 8× memory cut — and every scored pair runs a
    * codegen'd byte-loop integer dot product with zero per-pair array
    * materialization. Scores are EXACT integers (max 255²·dim ≪ 2^63),
    * replayable bit-for-bit by any engine. Ranges are one aggregate
    * collected to the driver — model state like [[kmeansTrain]]'s
    * centroids, never record data.
    *
    * The quantization formula is `floor((x-min)·255/(max-min) + 0.5)` —
    * floor, not round(): Spark's Round on doubles detours through
    * BigDecimal per value, and the oracle uses the identical formula so
    * the tie direction is shared.
    *
    * Scale shape: one range aggregate over the corpus, then the same
    * broadcast-queries map-only scan + WindowGroupLimit top-k as
    * [[bruteForceTopK]] — quantization adds no shuffle.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, dim: Int): DataFrame = {
    val base = corpus.select(col(idCol).cast("long").as("cid"),
      col(vecCol).cast("array<double>").as("cv"))
    val r = base.agg(
      array((0 until dim).map(i => min(element_at(col("cv"), i + 1))): _*)
        .as("mins"),
      array((0 until dim).map(i => max(element_at(col("cv"), i + 1))): _*)
        .as("maxs")).collect()(0)
    val mins = r.getSeq[Double](0).toArray
    val maxs = r.getSeq[Double](1)
    // constant dimensions carry no signal: scale 0 quantizes them to 0
    val scales = mins.indices.map { i =>
      if (maxs(i) == mins(i)) 0.0 else 255.0 / (maxs(i) - mins(i))
    }.toArray
    import graft.functions.VectorFunctions.{byteDotProduct, quantizeBytes}
    val qc = base.select(col("cid"),
      quantizeBytes(col("cv"), mins, scales).as("cq"))
    val q = broadcast(queries
      .select(col(idCol).cast("long").as("qid"),
        col(vecCol).cast("array<double>").as("qv"))
      .select(col("qid"), quantizeBytes(col("qv"), mins, scales).as("qq")))
    val scored = q.join(qc, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        byteDotProduct(col("qq"), col("cq")).as("score"))
    topKPerGroup(scored, "qid", k,
      payload = Seq("cid", "score"),
      orderAsc = Seq(negate(col("score")).as("__neg"), col("cid").as("__cid")))
  }

  /** Per-query probe cells: the `nprobe` highest-cosine centroids of
    * each query vector (the standard IVF recall knob — nprobe=1 searches
    * only the home cell and misses neighbors that quantized across a
    * cell boundary).
    */
  def ivfProbes(queries: DataFrame, centroids: DataFrame, idCol: String,
                vecCol: String, nprobe: Int): DataFrame = {
    val cent = broadcast(centroids
      .select(col(idCol).as("cent_id"), col(vecCol).as("cv"))
      .withColumn("cn", norm(col("cv"))))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = q.join(cent, lit(true))
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .select("qid", "cent_id", "cos")
    topKPerGroup(scored, "qid", nprobe,
      payload = Seq("cent_id"),
      orderAsc = Seq(negate(col("cos")).as("__negcos"), col("cent_id").as("__cid")))
      .select(col("qid"), col("cent_id").as("cell"))
  }

  /** IVF ANN search: exact cosine top-k over the union of each query's
    * `nprobe` probe cells — the scale path where cells bound the
    * candidate set. The (query × probe-cell) table is tiny and
    * broadcast; the corpus streams partitioned by its home cell.
    */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, nprobe: Int = 2): DataFrame = {
    val assign = ivfAssign(corpus, centroids, idCol, vecCol)
      .withColumnRenamed("vec_id", "__aid")
    val withCell = corpus.join(assign, corpus(idCol) === col("__aid"))
      .drop("__aid")
      .withColumn("__n", norm(col(vecCol)))
    val qvecs = corpus.join(
      broadcast(queries.select(col(idCol).as("__qid"))), col(idCol) === col("__qid"))
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val probes = ivfProbes(qvecs.select(col("qid").as(idCol), col("qv").as(vecCol)),
      centroids, idCol, vecCol, nprobe)
    val q = probes.join(qvecs, "qid")
      .select(col("cell"), col("qid"), col("qv"), col("qn"))
    val c = withCell.select(col("cell"), col(idCol).as("cid"),
      col(vecCol).as("cv"), col("__n").as("cn"))
    val scored = broadcast(q).join(c, Seq("cell")).filter(col("qid") =!= col("cid"))
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 3))
      .select("qid", "cid", "cos")
    topKPerGroup(scored, "qid", k,
      payload = Seq("cid", "cos"),
      orderAsc = Seq(negate(col("cos")).as("__negcos"), col("cid").as("__cid")))
      .select(col("qid"), col("cid"), col("cos"), col("rank"))
  }

  /** Multi-table random-hyperplane signatures: one row per (id, table),
    * table t using planes [t·nPlanes, (t+1)·nPlanes). Multiple
    * independent tables OR-amplify recall: a near pair missed by one
    * table's buckets is caught by another, without lowering any single
    * table's precision. Output: (idCol, table, lsh_sig).
    */
  def lshSignatures(df: DataFrame, idCol: String, vecCol: String,
                    nPlanes: Int, dims: Int, nTables: Int): DataFrame = {
    val tables = (0 until nTables).map { t =>
      val bits = (0 until nPlanes).map { p =>
        when(dot(col(vecCol), lit(planeWeights(t * nPlanes + p, dims))) >= 0,
          lit("1")).otherwise(lit("0"))
      }
      struct(lit(t).as("table"), concat(bits: _*).as("sig"))
    }
    df.select(col(idCol), explode(array(tables: _*)).as("__t"))
      .select(col(idCol), col("__t.table").as("table"), col("__t.sig").as("lsh_sig"))
  }

  /** Bucketed ANN: candidates share an LSH signature in ANY of the
    * `nTables` tables (union + pair-dedup = OR-amplification); exact
    * cosine is computed only on deduped candidates. `bucketCap` drops
    * overflow buckets outright — a degenerate bucket (zero vectors,
    * near-identical corpus slices) would otherwise degrade toward
    * O(n²/buckets) on one hot reducer; capped buckets lose candidates a
    * healthier table usually recovers. Use [[bucketSizes]] to account
    * for what a cap would drop.
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              nPlanes: Int, dims: Int, k: Int, nTables: Int = 1,
              bucketCap: Option[Int] = None): DataFrame = {
    val sigs = lshSignatures(corpus, idCol, vecCol, nPlanes, dims, nTables)
    val capped = bucketCap match {
      case Some(cap) =>
        val ok = sigs.groupBy("table", "lsh_sig")
          .agg(count(lit(1)).as("__bn")).filter(col("__bn") <= cap)
          .select("table", "lsh_sig")
        sigs.join(ok, Seq("table", "lsh_sig"), "left_semi")
      case None => sigs
    }
    val a = capped.select(col("table"), col("lsh_sig"), col(idCol).as("qid"))
    val b = capped.select(col("table"), col("lsh_sig"), col(idCol).as("cid"))
    val cand = a.join(b, Seq("table", "lsh_sig"))
      .filter(col("qid") < col("cid")).select("qid", "cid").distinct()
    val v = corpus.select(col(idCol), col(vecCol)).withColumn("__n", norm(col(vecCol)))
    val scored = cand
      .join(v.select(col(idCol).as("qid"), col(vecCol).as("qv"), col("__n").as("qn")), "qid")
      .join(v.select(col(idCol).as("cid"), col(vecCol).as("cv"), col("__n").as("cn")), "cid")
      .withColumn("cos", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 3))
      .select("qid", "cid", "cos")
    topKPerGroup(scored, "qid", k,
      payload = Seq("cid", "cos"),
      orderAsc = Seq(negate(col("cos")).as("__negcos"), col("cid").as("__cid")))
      .select(col("qid"), col("cid"), col("cos"))
  }

  /** Bucket-size accounting for the cap policy: (table, lsh_sig, n). */
  def bucketSizes(corpus: DataFrame, idCol: String, vecCol: String,
                  nPlanes: Int, dims: Int, nTables: Int): DataFrame =
    lshSignatures(corpus, idCol, vecCol, nPlanes, dims, nTables)
      .groupBy("table", "lsh_sig").agg(count(lit(1)).as("n"))

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with k-means, then
    * compare pairs ONLY within a cluster — a vector is a semantic
    * duplicate when some LOWER-id vector in the same cluster has cosine
    * ≥ `threshold` (keep-lowest-id, the same canonical-member policy as
    * the MinHash cluster dedup). Output: (vec_id, cell, nn_cos, is_dup)
    * where nn_cos is the max cosine to any lower-id cluster-mate
    * (−1.0 when the vector is alone below it in its cell).
    *
    * Scale shape: the quadratic term is bounded by the cluster
    * partition — (n/k)² per cell instead of n² global, and k grows with
    * the corpus (SemDeDup used 11k clusters for LAION). Training cost
    * is [[kmeansTrainModel]]'s one-job-per-iteration; assignment and
    * scoring shuffle on `cell` (an equi-join), never all-pairs.
    * Cosines are rounded to 6 like the k-means path so any engine
    * replays the keep set exactly.
    */
  def semDedup(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
               iters: Int, dim: Int, threshold: Double): DataFrame = {
    val model = kmeansTrainModel(vecs, idCol, vecCol, k, iters, dim)
    // assignment inline (keeping the vector) so the cell id and the
    // embedding travel together — no join, one shuffle to the cells
    val base = vecs.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("ev"))
      .withColumn("__vn", norm(col("ev")))
    val scored = array(model.map { case (id, cv) =>
      val cn = math.sqrt(cv.map(x => x * x).sum)
      struct(
        round(dot(col("ev"), typedLit(cv)) / (col("__vn") * lit(cn)), 6)
          .as("cos"),
        lit(-id).as("negid"))
    }: _*)
    val withCell = base.select(col("vec_id"), col("ev"),
      (-array_max(scored).getField("negid")).as("cell"))
    // per-cell nearest-neighbor via ONE expression over the collected
    // cell ([[graft.functions.CellMaxCosine]]) — the m² loop runs over
    // primitive arrays instead of materializing m² join rows carrying
    // duplicated 0.5 KB vectors; the (n/k)² cell bound is unchanged
    withCell
      .groupBy(col("cell"))
      .agg(collect_list(struct(col("vec_id"), col("ev"))).as("__vs"))
      .select(col("cell"),
        explode(graft.functions.VectorFunctions.cellMaxCosine(col("__vs")))
          .as("__r"))
      .select(col("__r.vec_id").as("vec_id"), col("cell"),
        col("__r.nn_cos").as("nn_cos"),
        when(col("__r.nn_cos") >= threshold, 1).otherwise(0).as("is_dup"))
  }

  /** k-SCALABLE twin of [[kmeansTrainModel]]: the identical
    * fixed-point mean update (floor(x·1e9+0.5) long accumulators), but
    * the per-row argmax runs through the
    * [[graft.functions.NearestCell]] codegen kernel — the centroid
    * matrix rides along as ONE codegen reference object, so the plan
    * is O(1) in k. The literal-struct argmax stops fitting whole-stage
    * codegen past a few dozen centroids (k·dim literal doubles in the
    * expression tree, 64 KB method limit → interpreted fallback);
    * production SemDeDup cell counts are in the thousands (11k for
    * LAION in Abbas et al. 2023), which only this path survives.
    * Assignment semantics are NearestCell's fixed-point
    * floor(cos·1e6+0.5) with ties to the LOWER centroid id — the
    * oracle replays the same floor formula, exactly as the IVF gates
    * already do.
    */
  def kmeansTrainScaled(vecs: DataFrame, idCol: String, vecCol: String,
                        k: Int, iters: Int,
                        dim: Int): Array[(Long, Array[Double])] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val base = vecs.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("ev"))
    var cents: Array[(Long, Array[Double])] =
      base.filter(col("vec_id") < k).as[(Long, Seq[Double])]
        .collect().sortBy(_._1).map { case (id, v) => (id, v.toArray) }
    var it = 0
    while (it < iters) {
      val cell =
        graft.functions.VectorFunctions.nearestCell(col("ev"), cents)
          .as("cell")
      val sums = (0 until dim).map(i =>
        sum(floor(element_at(col("ev"), i + 1) * 1e9 + 0.5)).as(s"__s$i"))
      val agg = base
        .select(cell, col("ev"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("__n"), sums: _*)
        .select(col("cell"), col("__n").as("__n"),
          array((0 until dim).map(i => col(s"__s$i")): _*).as("__sums"))
      cents = agg.as[(Long, Long, Seq[Long])].collect()
        .sortBy(_._1)
        .map { case (id, n, s) =>
          (id, s.map(x => x.toDouble / 1e9 / n).toArray)
        }
      it += 1
    }
    cents
  }

  /** [[semDedup]] at production cell counts: training argmax AND final
    * assignment both run through [[graft.functions.NearestCell]]
    * (plan size O(1) in k — see [[kmeansTrainScaled]]); the per-cell
    * quadratic keeps the same [[graft.functions.CellMaxCosine]]
    * kernel. Growing k is what actually shrinks the SemDeDup (n/k)²
    * cell bound, so the scale path and the k-scaling path are the same
    * thing.
    */
  def semDedupScaled(vecs: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int, dim: Int,
                     threshold: Double): DataFrame = {
    val model = kmeansTrainScaled(vecs, idCol, vecCol, k, iters, dim)
    val base = vecs.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("ev"))
    val withCell = base.withColumn("cell",
      graft.functions.VectorFunctions.nearestCell(col("ev"), model))
    withCell
      .groupBy(col("cell"))
      .agg(collect_list(struct(col("vec_id"), col("ev"))).as("__vs"))
      .select(col("cell"),
        explode(graft.functions.VectorFunctions.cellMaxCosine(col("__vs")))
          .as("__r"))
      .select(col("__r.vec_id").as("vec_id"), col("cell"),
        col("__r.nn_cos").as("nn_cos"),
        when(col("__r.nn_cos") >= threshold, 1).otherwise(0).as("is_dup"))
  }

  /** Product-quantization codebooks (Jégou et al. 2011, "Product
    * quantization for nearest neighbor search"): the vector space is
    * split into `m` subspaces of `dsub` dims; each subspace gets `k`
    * codewords. Codewords are a deterministic corpus subset (every
    * `step`-th vector id, `k` of them — the same reproducible-seed
    * pattern as [[ivfAssign]]'s centroid subset), so every engine
    * derives the identical codebooks. Model state: m·k·dsub doubles
    * (8·16·8 = 1 KB at the defaults) — driver-held literals, never
    * record data.
    */
  def pqCodebooks(vecs: DataFrame, idCol: String, vecCol: String,
                  m: Int, dsub: Int, k: Int, step: Int): Array[Array[Array[Double]]] = {
    val rows = vecs
      .filter(col(idCol) % step === 0 && col(idCol) < k.toLong * step)
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("ev"))
      .collect()
      .map(r => (r.getLong(0) / step, r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(rows.length == k,
      s"pqCodebooks: expected $k codeword vectors, found ${rows.length}")
    Array.tabulate(m)(mi =>
      rows.map { case (_, ev) => ev.slice(mi * dsub, (mi + 1) * dsub) })
  }

  /** PQ ENCODE: map every vector to `m` codeword indices (nearest
    * codeword per subspace by squared L2, ties to the lower index) and
    * byte-pack them — a 64-dim double vector compresses to m = 8 bytes,
    * the 64× memory cut that makes billion-vector indexes fit in RAM.
    * Distances are fixed-point longs (`floor(d²·1e6 + 0.5)`) so the
    * argmin is exact and engine-replayable; d² expands as
    * |s|² − 2·s·c + |c|², each dot an in-order codegen loop, the
    * codeword norm a driver-side literal. Map-only: no shuffle at any
    * corpus size, composable with the scan.
    */
  def pqEncode(vecs: DataFrame, idCol: String, vecCol: String,
               codebooks: Array[Array[Array[Double]]]): DataFrame = {
    import graft.functions.VectorFunctions.pqEncodeBytes
    vecs.select(col(idCol).cast("long").as("vec_id"),
      pqEncodeBytes(col(vecCol).cast("array<double>"), codebooks).as("codes"))
  }

  /** PQ ADC top-k search: each (small, broadcast) query builds a
    * per-subspace lookup table of fixed-point inner products against
    * every codeword — m·k longs — and scoring a corpus vector is m
    * byte-indexed table lookups ([[graft.functions.PqAdcScore]]), not a
    * dim-length dot product. The corpus side streams its 8-byte codes
    * map-only into the same WindowGroupLimit top-k as
    * [[bruteForceTopK]]; nothing but the codes ever shuffles. This is
    * the memory/bandwidth scale path: at 100 TB the quantized index is
    * ~1/64th the raw embeddings and the score loop touches 8 bytes per
    * candidate.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int,
             codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val enc = pqEncode(corpus, idCol, vecCol, codebooks)
      .withColumnRenamed("vec_id", "cid")
    val lut = array((0 until m).map { mi =>
      val sub = slice(col("qv"), mi * dsub + 1, dsub)
      array(codebooks(mi).map(cw =>
        floor(dot(sub, typedLit(cw)) * lit(1e6) + lit(0.5))): _*)
    }: _*)
    val qb = broadcast(queries
      .select(col(idCol).cast("long").as("qid"),
        col(vecCol).cast("array<double>").as("qv"))
      .select(col("qid"), lut.as("lut")))
    import graft.functions.VectorFunctions.pqAdcScore
    val scored = qb.join(enc, col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        pqAdcScore(col("codes"), col("lut")).as("score"))
    topKPerGroup(scored, "qid", k,
      payload = Seq("cid", "score"),
      orderAsc = Seq(negate(col("score")).as("__neg"), col("cid").as("__cid")))
  }

  /** IVF-PQ search — the billion-scale index layout (faiss `IVFx,PQy`
    * with `by_residual=false`): the coarse quantizer ([[ivfAssign]])
    * partitions the corpus into cells so a query touches only its
    * `nprobe` probe cells' candidates, and every candidate is scored from
    * its 8-byte PQ code by the ADC table-lookup kernel — candidates
    * bounded by IVF, bytes-per-candidate bounded by PQ. Corpus side:
    * two map-only argmax passes (cell + codes, no shuffle), one
    * equi-join against the broadcast (query × probe-cell) table, then
    * the WindowGroupLimit top-k. At 100 TB the scan reads cell + 8
    * bytes per vector and a probe touches nprobe/k_cells of them.
    */
  def ivfPqTopK(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String, k: Int, nprobe: Int,
                codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    import graft.functions.VectorFunctions.{nearestCell, pqAdcScore, pqEncodeBytes}
    // centroids are driver-held model state (ncells is an index design
    // parameter, bounded by construction — faiss sizes it ~sqrt(n));
    // collecting them makes the corpus pass MAP-ONLY: cell + code in one
    // projection, no join, no window, zero corpus shuffle before top-k.
    // (A broadcast cross-join here materializes |corpus|·k pair rows
    // each carrying both dense vectors — the sf1 measurement of that
    // shape was 10× the yardstick.)
    val cents = centroids
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val c = corpus.select(col(idCol).cast("long").as("cid"),
      col(vecCol).cast("array<double>").as("ev"))
      .select(col("cid"),
        nearestCell(col("ev"), cents).as("cell"),
        pqEncodeBytes(col("ev"), codebooks).as("codes"))
    val qvecs = queries.select(col(idCol).cast("long").as("qid"),
      col(vecCol).cast("array<double>").as("qv"))
    // probe ranking uses the same fixed-point floor cosine as the
    // assignment kernel; queries × centroids is a broadcast-sized
    // cross-product (both sides are small), so the pair materialization
    // that ruled this shape out for the corpus is irrelevant here
    val centDf = broadcast(centroids
      .select(col(idCol).cast("long").as("cell"),
        col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cn", norm(col("cv"))))
    val probeScored = qvecs.join(centDf, lit(true))
      .select(col("qid"), col("qv"),
        floor(dot(col("qv"), col("cv")) / (norm(col("qv")) * col("cn")) *
          lit(1e6) + lit(0.5)).as("fs"),
        col("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("fs").desc, col("cell"))
    val probes = probeScored
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= nprobe)
      .select(col("qid"), col("qv"), col("cell"))
    val lut = array((0 until m).map { mi =>
      val sub = slice(col("qv"), mi * dsub + 1, dsub)
      array(codebooks(mi).map(cw =>
        floor(dot(sub, typedLit(cw)) * lit(1e6) + lit(0.5))): _*)
    }: _*)
    val q = broadcast(probes.select(col("qid"), col("cell"), lut.as("lut")))
    val scored = q.join(c, Seq("cell")).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("cell"),
        pqAdcScore(col("codes"), col("lut")).as("score"))
    topKPerGroup(scored, "qid", k,
      payload = Seq("cid", "cell", "score"),
      orderAsc = Seq(negate(col("score")).as("__neg"), col("cid").as("__cid")))
  }
}
