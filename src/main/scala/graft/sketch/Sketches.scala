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

  /** One-slot cache for [[bloomPrunedSemiJoin]]'s persisted distinct-key
    * relation — see that method's model-state note.
    */
  private val lastKeyCache =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

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
    // fanOut (r16): the token explode runs d md5 digests per token —
    // a split-starved scan otherwise serializes the whole build on one
    // task (0.99 s of the 1.5 s x_sketch_countmin pin)
    graft.model.Tables.fanOut(df.select(text.as("__t")), col("__t"))
      .select(explode(split(col("__t"), " ")).as("tok"))
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
    val trueCounts = graft.model.Tables.fanOut(
        df.select(text.as("__t")), col("__t"))
      .select(explode(split(col("__t"), " ")).as("token"))
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

  /** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet &
    * Meunier 2007): `m = 2^p` registers, each holding the max leading-
    * zero rank seen in its hash bucket. The whole corpus folds into a
    * bounded-cardinality aggregate exactly like [[countMinCells]]: the
    * map side combines to at most `m` (bucket → max rank) partial rows
    * per partition, so at ANY corpus size the shuffle carries ≤
    * m·partitions tiny rows and the sketch itself is `m` bytes of model
    * state. Registers merge by element-wise max, which is what makes
    * the sketch distributable (and what the mergeability spec pins).
    *
    * Hash = first 8 md5 hex chars (32 bits, the repo's replayable-seed
    * pattern): low `p` bits pick the bucket, the remaining `w = 32-p`
    * bits feed the rank `rho = (leading zeros in w bits) + 1 =
    * w+1 - bitlength(v)`. Bit length is computed as the LENGTH OF THE
    * BASE-2 STRING (`conv(v,10,2)` here, `bin(v)` in the oracle) — an
    * integer-exact formulation both engines replay byte-identically,
    * with no floating log2 at the power-of-two edges.
    */
  def hllRegisters(df: DataFrame, key: Column, p: Int = 8): DataFrame = {
    // one codegen digest pass emits bucket*64+rho packed in an int —
    // the hex/decimal/binary string chain this replaces allocated three
    // strings per row and dominated the scan (see HllBucketRank; long
    // keys skip even the string cast via the digit-buffer fast path)
    val isLong = df.select(key.as("__k")).schema.head.dataType ==
      org.apache.spark.sql.types.LongType
    val packed = org.apache.spark.sql.graftshim.shim.column(
      graft.functions.HllBucketRank(
        org.apache.spark.sql.graftshim.shim.expression(
          if (isLong) key else key.cast("string")), p))
    df.select(packed.as("pk"))
      .groupBy(expr("CAST(pk div 64 AS BIGINT)").as("bucket"))
      .agg(max(expr("CAST(pk % 64 AS INT)")).as("register"))
  }

  /** Production path: one-row (m, nonzero_buckets, s_scaled, est) from
    * a register table — no exact pass anywhere. The harmonic-mean
    * estimator stays ENTIRELY in integer arithmetic so the DuckDB
    * oracle replays it bit-exactly: `S = Σ_buckets 2^(w+1-M_b)` (scaled
    * by 2^(w+1) so every term — including empty buckets at M=0 — is a
    * whole number), `est = α_m·m²·2^(w+1)/S` with `α_256 ≈ 0.71827` as
    * the rational 71827/100000 and the division done in two guarded
    * integer steps that never overflow a BIGINT. The truncation those
    * divisions introduce is ~1e-4 relative — three orders below the
    * sketch's own 1.04/√m ≈ 6.5% standard error, which is what the
    * gate's `ok` column asserts (|est−exact| ≤ 20%·exact ≈ 3σ).
    */
  def hllEstimateFromRegs(regs: DataFrame, p: Int = 8): DataFrame =
    estimatorTail(regs, Nil, p)
      .select(lit(1 << p).as("m"), col("nb").as("nonzero_buckets"),
        col("s_scaled"), col("est"))

  /** The p=8 integer estimator tail, shared by every register→estimate
    * fold (ungrouped, grouped, sliding): one (keys…, nb, s_scaled, est)
    * row per key group. 2^(w+1−register) comes from a literal power
    * table — integer-exact and free of shift-signature pitfalls;
    * register ∈ [1, w+1]. The streaming twin
    * ([[graft.streaming.Stateful.hllSlidingStream]]) carries a local
    * Scala mirror of this arithmetic for its driver-free state folds —
    * change one, change both.
    */
  private def estimatorTail(regs: DataFrame, keyCols: Seq[String],
                            p: Int): DataFrame = {
    require(p == 8, "estimator constant α is instantiated for p=8")
    val m = 1 << p
    val w = 32 - p
    val pows = (0 to w + 1).map(i => 1L << ((w + 1) - i)).toArray
    val grouped =
      if (keyCols.isEmpty) regs.groupBy()
      else regs.groupBy(keyCols.map(col): _*)
    grouped.agg(
        count(lit(1)).as("nb"),
        sum(element_at(typedLit(pows), col("register") + 1)).as("s_present"))
      .withColumn("s_scaled",
        col("s_present") + (lit(m.toLong) - col("nb")) * (1L << (w + 1)))
      .withColumn("q1",
        expr(s"CAST(${m.toLong * m * (1L << (w + 1))} AS BIGINT) div s_scaled"))
      .withColumn("est", expr("(71827 * q1) div 100000"))
      .drop("s_present", "q1")
  }

  /** Per-group register tables — the production half of
    * [[hllGroupedEstimate]] in isolation: ≤ |groups|·m rows out, one
    * map-side-combined aggregate, no exact pass anywhere.
    */
  def hllGroupedRegisters(df: DataFrame, group: Column, key: Column,
                          p: Int = 8): DataFrame = {
    val isLong = df.select(key.as("__k")).schema.head.dataType ==
      org.apache.spark.sql.types.LongType
    val packed = org.apache.spark.sql.graftshim.shim.column(
      graft.functions.HllBucketRank(
        org.apache.spark.sql.graftshim.shim.expression(
          if (isLong) key else key.cast("string")), p))
    df.select(group.as("g"), packed.as("pk"))
      .groupBy(col("g"), expr("CAST(pk div 64 AS BIGINT)").as("bucket"))
      .agg(max(expr("CAST(pk % 64 AS INT)")).as("register"))
  }

  /** Grouped HLL — `COUNT(DISTINCT key) GROUP BY g` as sketches, the
    * workhorse cardinality shape (distinct users per service, distinct
    * URLs per domain). One aggregate with key cardinality ≤
    * |groups|·m: partial max per (group, bucket) map-side, so the
    * shuffle is bounded by the sketch size times the group count no
    * matter how many rows or distinct keys flow in. Output one row per
    * group with the same integer-exact estimator as [[hllEstimateFromRegs]].
    */
  def hllGroupedEstimate(df: DataFrame, group: Column, key: Column,
                         p: Int = 8): DataFrame =
    estimatorTail(hllGroupedRegisters(df, group, key, p), Seq("g"), p)
      .select(col("g"), col("nb").as("nonzero_buckets"), col("s_scaled"),
        col("est"))

  /** Sliding-window distinct estimate by PANE-SKETCH MERGING — the
    * mergeability argument in operative form: raw rows aggregate into
    * per-(series, pane) registers exactly ONCE; each pane's sketch then
    * feeds the `panes` hopping windows that contain it and windows
    * merge by register max (associative, idempotent). The explode runs
    * on REGISTER rows (≤ |series|·|panes|·m), never on events — at
    * 100 TB the raw stream is touched once per pane regardless of how
    * many window widths ride on the same pane sketches. Integer-exact
    * estimator identical to [[hllGroupedEstimate]] (p = 8).
    */
  def hllSlidingEstimate(df: DataFrame, series: Column, paneCol: Column,
                         key: Column, panes: Int, p: Int = 8): DataFrame = {
    require(p == 8, "estimator constant α is instantiated for p=8")
    val isLong = df.select(key.as("__k")).schema.head.dataType ==
      org.apache.spark.sql.types.LongType
    val packed = org.apache.spark.sql.graftshim.shim.column(
      graft.functions.HllBucketRank(
        org.apache.spark.sql.graftshim.shim.expression(
          if (isLong) key else key.cast("string")), p))
    val regs = df.select(series.as("g"), paneCol.as("pane"), packed.as("pk"))
      .groupBy(col("g"), col("pane"),
        expr("CAST(pk div 64 AS BIGINT)").as("bucket"))
      .agg(max(expr("CAST(pk % 64 AS INT)")).as("register"))
    // trailing windows: window w merges panes [w-(panes-1), w] — "the
    // last `panes` panes ending at w" — so pane p feeds windows p..p+k
    val merged = regs
      .withColumn("win",
        explode(expr(s"sequence(pane, pane + ${panes - 1})")))
      .groupBy(col("g"), col("win"), col("bucket"))
      .agg(max(col("register")).as("register"))
    estimatorTail(merged, Seq("g", "win"), p)
      .select(col("g"), col("win"), col("nb").as("nonzero_buckets"),
        col("s_scaled"), col("est"))
  }

  /** Estimate + the exact comparator a sketch exists to avoid — the
    * gate's ground truth (production drops it and keeps
    * [[hllEstimateFromRegs]]). The comparator's exact-distinct shuffle
    * is ~70% of this query's cost at sf10 — which is the point of the
    * sketch: the register build alone (`x_sketch_hll_build`) is the
    * production path and the honest yardstick.
    */
  def hllEstimate(df: DataFrame, key: Column, p: Int = 8): DataFrame = {
    val est = hllEstimateFromRegs(hllRegisters(df, key, p), p)
    val exact = df.agg(countDistinct(key).as("exact_cnt"))
    est.crossJoin(broadcast(exact))
      .select(col("m"), col("nonzero_buckets"), col("s_scaled"), col("est"),
        col("exact_cnt"),
        (abs(col("est") - col("exact_cnt")) * 5 <= col("exact_cnt")).as("ok"))
  }

  /** Two-pass heavy hitters: keys with frequency ≥ φ·n, WITHOUT a
    * full-cardinality groupBy.
    *
    * Pass 1 counts keys only in a deterministic 1/`sampleMod` row sample
    * (md5 of key#rowId — the repo's replayable-seed pattern, so any
    * engine draws the SAME sample); candidates are keys whose sample
    * count clears HALF the scaled threshold (the 2× relaxation absorbs
    * sampling noise at the φ boundary). Pass 2 exact-counts ONLY the
    * candidates (a semi-join keeps light keys out of the aggregate) and
    * applies the exact φ·n cut.
    *
    * Scale: the pass-1 shuffle carries the SAMPLE's key partials
    * (1/sampleMod of the rows, and light keys mostly vanish below one
    * occurrence); pass 2's aggregate is candidate-only — at a φ of 1%
    * that is ≤ 200 keys by pigeonhole (2/φ with the relaxation). The
    * full key cardinality never crosses the wire, which is the entire
    * point versus `groupBy(key)` at 10⁹⁺ distinct keys. Both passes are
    * deterministic, so the final answer is EXACT (sampling can in
    * principle drop a borderline true heavy below the relaxed candidate
    * bar — the audit column `scnt` exposes the margin; at 2× relaxation
    * a miss needs the key's sample rate to fall below half its true
    * rate, a large-deviation event the gate's oracle replays
    * identically anyway).
    */
  def heavyHitters(rows: DataFrame, key: Column, rowId: Column,
                   phiNum: Int = 1, phiDen: Int = 100,
                   sampleMod: Int = 8): DataFrame = {
    val base = rows.select(key.as("key"), rowId.as("rid"))
    val n = base.agg(count(lit(1)).as("n"))
    // row identity alone seeds the sample (independent of key by hash,
    // zero-alloc long fast path — the md5-of-concat Column chain cost
    // 4× at 60M rows)
    val sample = base.filter(
      org.apache.spark.sql.graftshim.shim.column(
        graft.functions.Md5Mod(
          org.apache.spark.sql.graftshim.shim.expression(col("rid")),
          sampleMod)) === 0L)
    val cand = sample.groupBy(col("key")).agg(count(lit(1)).as("scnt"))
      .crossJoin(broadcast(n))
      .filter(col("scnt") * (2L * phiDen * sampleMod) >= col("n") * phiNum)
      .select(col("key"), col("scnt"))
    base.join(cand, "key")
      .groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"), min(col("scnt")).as("scnt"))
      .crossJoin(broadcast(n))
      .filter(col("cnt") * phiDen >= col("n") * phiNum)
      .select(col("key"), col("cnt"), col("scnt"), col("n"))
  }

  /** Bloom-pruned semi-join — the runtime-filter pattern for joins
    * whose build side is too large to broadcast as an exact set but
    * whose KEY MEMBERSHIP compresses into a bitset: the build side's
    * distinct keys set k double-hashed bits (Kirsch-Mitzenmacher over
    * one md5's h1/h2 halves — ONE digest per key/row, not k) in a
    * bitset SIZED TO THE KEY COUNT (r10 shipped a fixed 2^18: at sf10's
    * 1.5M build keys the filter was saturated — fp ≈ 1 — and pruned
    * nothing while still paying the hash math). The probe side tests
    * the bitset map-side inside its scan stage via the codegen
    * [[graft.functions.BloomProbe]] expression, and only the surviving
    * ~|match| + fp·|probe| rows reach the exact residual semi-join that
    * removes false positives — so the RESULT is exactly the plain
    * semi-join at any fp rate, and at 100 TB the win is the shuffle:
    * non-matching probe rows die in the scan instead of crossing the
    * network. Bit math is engine-replayable: bit_j = (h1 + j·h2) mod m
    * with h1‖h2 = first 8 bytes of md5(CAST(key AS VARCHAR)).
    *
    * Driver model state: the bitset words, ≤ mBits/8 bytes (≤ 4 MiB at
    * the 2^25 cap), assembled from a bit_or AGGREGATE over word index —
    * ≤ mBits/64 rows cross to the driver regardless of key count.
    *
    * ONE build action and ONE build-side evaluation: the bitset rides a
    * single bit_or aggregate over the PERSISTED distinct-key relation,
    * and the residual semi-join broadcasts that SAME materialized
    * relation — a non-deterministic build side (sampled, rand-salted)
    * cannot diverge between the bitset and the residual, because both
    * read one pinned evaluation. Bit positions are computed at the 2^25
    * cap and the word table's per-word COUNT also yields the key count
    * the sizing needs (k rows per distinct key, exactly) — no separate
    * count() job. The collected 2^25-grain words then FOLD DOWN to the
    * sized bitset: with power-of-two sizes, bit mod 2^25 then mod m ≡
    * bit mod m, so OR-ing word W into W mod (m/64) reproduces exactly
    * the bitset a direct mod-m build would have written — and the probe
    * side's mask-m math matches bit for bit.
    *
    * Model state: the distinct-key relation stays cached
    * (MEMORY_AND_DISK) for the returned plan's residual join — it is
    * broadcast-bounded by contract (the residual ships it to every
    * executor regardless). The cache is BOUNDED TO ONE RESIDENT SET
    * (the GraphFixtures pattern): each invocation unpersists the
    * previous invocation's relation, so a bench/suite session running
    * this hundreds of times holds at most one key cache, not hundreds.
    * CONTRACT: the next invocation therefore INVALIDATES the cache
    * backing any plan this call returned — an earlier plan still
    * executes correctly (persist is advisory; Spark recomputes the
    * distinct on a cache miss) but re-pays the distinct per action.
    * Build-once-use-once, or execute each returned plan before
    * constructing the next; two live plans never both hold the cache.
    */
  def bloomPrunedSemiJoin(big: DataFrame, bigKey: Column,
                          small: DataFrame, smallKey: Column,
                          mBits: Int = -1, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.graftshim.shim
    // ONE evaluation of the build side, pinned: distinct keys persist,
    // the bitset aggregate materializes the cache, the residual
    // broadcast re-reads it
    val keyRows = small.select(smallKey.as("__k")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lastKeyCache.getAndSet(keyRows) match {
      case null => ()
      case prev => prev.unpersist(blocking = false)
    }
    val (words, nKeys) = bloomBuildWords(keyRows, col("__k"), mBits, k)
    val probe = shim.column(graft.functions.BloomProbe(
      shim.expression(bloomHashKey(big, bigKey)), words, k))
    // residual join on the NATIVE key type. Size-aware: the bitset
    // build already counted the distinct keys, so the residual picks
    // its physical join for free. Below the threshold, broadcast —
    // survivors never shuffle. Above it (30M keys ≈ 240 MB of build
    // side at sf100), the broadcast hint comes OFF: on a real cluster
    // that relation fans out |executors|× over the network, while the
    // bloom probe has already pruned the survivor stream to
    // ~|match| + fp·|big| rows — shuffling THAT is the plan a 100 TB
    // runtime filter exists to feed. (On local[32] the two are within
    // 15% of each other — broadcast pays no network in one JVM — so
    // the threshold is a cluster-shape decision, not a local tune.)
    val survivors = big.filter(probe)
    if (nKeys <= 4_000_000L)
      survivors.join(broadcast(keyRows), bigKey === col("__k"), "left_semi")
    else
      survivors.join(keyRows, bigKey === col("__k"), "left_semi")
  }

  /** Probe-only production path — the map-side half of
    * [[bloomPrunedSemiJoin]] in isolation: build the bitset from the
    * build side's keys (duplicates are harmless — bit_or is idempotent
    * — so NO distinct shuffle happens anywhere) and return the probe
    * side's surviving rows, INCLUDING the bitset's deterministic false
    * positives. This is the operator a 100 TB runtime filter actually
    * inserts before a shuffle: survivors ≈ |match| + fp·|probe| flow
    * on to whatever exact join follows. With an explicit `mBits` the
    * full bit math — h1‖h2 = first 8 md5 bytes of the key's decimal
    * rendering, bit_j = (h1 + j·h2) mod m — is engine-replayable, so
    * an oracle can reproduce the EXACT survivor set (false positives
    * and all) from the same SQL-visible md5 math.
    */
  def bloomProbeOnly(big: DataFrame, bigKey: Column,
                     small: DataFrame, smallKey: Column,
                     mBits: Int = -1, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.graftshim.shim
    val keyRows = small.select(smallKey.as("__k"))
    val (words, _) = bloomBuildWords(keyRows, col("__k"), mBits, k)
    big.filter(shim.column(graft.functions.BloomProbe(
      shim.expression(bloomHashKey(big, bigKey)), words, k)))
  }

  /** Bottom-k hash-sample for quantile estimation — the KMV/bottom-k
    * family (Bar-Yossef et al. 2002; the sampling backbone of BlinkDB-
    * style approximate engines): keep the k rows whose 32-bit id hash
    * is smallest. Deterministic (no RNG — the repo's reproducible-seed
    * pattern, replayable by any engine as
    * `('0x' || substr(md5(id), 1, 8))::BIGINT`), uniform when ids are
    * hash-independent of values, and MERGEABLE: bottom-k of a union is
    * the bottom-k of the per-partition bottom-k's, which is exactly
    * Spark's TakeOrdered physical shape — each partition keeps a k-row
    * heap map-side, the driver merges ≤ k·partitions rows, the full
    * value column never shuffles. Where [[graft.ops.Quantiles]] needs a
    * bounded value DOMAIN to collapse into a histogram, this bounds
    * MEMORY at k for any domain — the unbounded-domain quantile shape
    * that survives 100 TB.
    *
    * Ties: `(h, v)` ordering makes the kept v-multiset unique even
    * under 32-bit hash collisions (rows tied on both are
    * interchangeable for any v-statistic), so the sample — and every
    * estimate derived from it — is engine-independent.
    */
  def kmvQuantileSample(df: DataFrame, id: Column, value: Column,
                        k: Int = 4096): DataFrame = {
    import org.apache.spark.sql.graftshim.shim
    require(k >= 1, s"k=$k")
    df.select(
        shiftrightunsigned(shim.column(graft.functions.Md5First64(
          shim.expression(bloomHashKey(df, id)))), 32).as("h"),
        value.cast("long").as("v"))
      .orderBy(col("h"), col("v"))
      .limit(k)
  }

  /** Quantile estimates off the bottom-k sample: the floor-rank element
    * of the sorted ≤k-row sample at each requested centi-quantile. The
    * single-partition window is bounded by k (thousands of rows), never
    * by the data. Rank error is O(1/√k) by DKW — k=4096 ⇒ ±2.1% at
    * 95%, which the gate asserts against exact ±5-centile bounds.
    */
  def kmvQuantiles(df: DataFrame, id: Column, value: Column,
                   k: Int = 4096,
                   qCentis: Seq[Int] = Seq(50, 90, 99)): DataFrame =
    kmvEstimate(kmvQuantileSample(df, id, value, k), k, qCentis)

  /** The estimator half, decoupled so the STREAMING sample
    * ([[graft.streaming.Stateful.kmvSampleStream]]'s sink — a superset
    * of the bottom-k) feeds the same rank pick: re-take the k smallest
    * `(h, v)` rows, then pick each centi-quantile's floor-rank element.
    */
  def kmvEstimate(hv: DataFrame, k: Int,
                  qCentis: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(qCentis.nonEmpty && qCentis.forall(q => q >= 0 && q <= 100))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"), col("h"))
    val ranked = hv
      .select(col("h").cast("long").as("h"), col("v").cast("long").as("v"))
      .orderBy(col("h"), col("v")).limit(k)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    ranked
      .select(col("v"), col("rn"), col("n"),
        explode(lit(qCentis.toArray.map(_.toLong))).as("q_centi"))
      .filter(col("rn") ===
        floor((col("n") - 1) * col("q_centi") / lit(100L)) + 1)
      .select(col("q_centi"), col("n").as("n_sample"), col("v").as("est"))
  }

  /** Grouped twin of [[kmvQuantiles]] — per-group p50/p90/p99 over an
    * unbounded value domain (per-SERVICE latency percentiles, the form
    * observability actually asks for): a per-group bottom-k by id hash
    * via `row_number ≤ k`, which Spark's InferWindowGroupLimit rewrites
    * to WindowGroupLimit — per-partition state is k rows PER GROUP
    * map-side, never a whole group buffer — then the same floor-rank
    * pick on each ≤k-row group sample. One shuffle on the group key
    * (any grouped statistic pays it); where
    * [[graft.ops.Quantiles.groupedQuantiles]] needs a bounded domain,
    * this bounds memory at k·|groups| for any domain.
    */
  def kmvGroupedQuantiles(df: DataFrame, group: Column, id: Column,
                          value: Column, k: Int = 1000,
                          qCentis: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    import org.apache.spark.sql.graftshim.shim
    // InferWindowGroupLimit only rewrites rank filters whose limit is
    // <= spark.sql.window.group.limit.threshold (default 1000) — a k
    // above it silently degrades to whole-group window buffers
    require(k >= 1 && k <= 1000, s"k=$k out of (0, 1000]")
    require(qCentis.nonEmpty && qCentis.forall(q => q >= 0 && q <= 100))
    val hv = df.select(group.as("g"),
      shiftrightunsigned(shim.column(graft.functions.Md5First64(
        shim.expression(bloomHashKey(df, id)))), 32).as("h"),
      value.cast("long").as("v"))
    kmvGroupedEstimate(hv, k, qCentis)
  }

  /** Grouped estimator half, decoupled like [[kmvEstimate]] so the
    * grouped STREAMING sink (a per-group superset of the sample) feeds
    * the same per-group re-take + rank pick.
    */
  def kmvGroupedEstimate(ghv: DataFrame, k: Int,
                         qCentis: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(k >= 1 && k <= 1000, s"k=$k out of (0, 1000]")
    require(qCentis.nonEmpty && qCentis.forall(q => q >= 0 && q <= 100))
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("h"), col("v"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"), col("h"))
    val wn = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    ghv.select(col("g"), col("h").cast("long").as("h"),
        col("v").cast("long").as("v"))
      .withColumn("rnh", row_number().over(wk))
      .filter(col("rnh") <= k)
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(wn))
      .select(col("g"), col("v"), col("rn"), col("n"),
        explode(lit(qCentis.toArray.map(_.toLong))).as("q_centi"))
      .filter(col("rn") ===
        floor((col("n") - 1) * col("q_centi") / lit(100L)) + 1)
      .select(col("g"), col("q_centi"), col("n").as("n_sample"),
        col("v").as("est"))
  }

  /** Narrowest zero-alloc hash input for the bloom digest: integral
    * keys render decimal digits into a reusable buffer (≡ the string
    * cast, value-identical); everything else casts to string once.
    */
  private def bloomHashKey(df: DataFrame, c: Column): Column =
    df.select(c).schema.head.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.StringType => c
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => c.cast("long")
      case _ => c.cast("string")
    }

  /** The one-action bitset build shared by [[bloomPrunedSemiJoin]] and
    * [[bloomProbeOnly]]: k Kirsch-Mitzenmacher bit rows per key row →
    * word-indexed bit_or aggregate (map-side combined, ≤ 2^25/64 rows
    * to the driver) → fold to the sized power-of-two bitset. Returns
    * the words and the key-row count that fell out of the same pass.
    */
  private def bloomBuildWords(keyRows: DataFrame, keyCol: Column,
                              mBits: Int, k: Int): (Array[Long], Long) = {
    import org.apache.spark.sql.graftshim.shim
    val mCap = 1 << 25
    if (mBits > 0) require(mBits % 64 == 0 && (mBits & (mBits - 1)) == 0 &&
      mBits <= mCap,
      s"mBits must be a power of two packing into longs, at most $mCap")
    val h = shim.column(graft.functions.Md5First64(
      shim.expression(bloomHashKey(keyRows, keyCol))))
    val h1 = shiftrightunsigned(h, 32)
    val h2 = h.bitwiseAND(lit(0xFFFFFFFFL))
    val bits = explode(array((0 until k).map(j =>
      (h1 + lit(j.toLong) * h2).bitwiseAND(lit(mCap.toLong - 1))): _*))
    val wordRows = keyRows
      .select(bits.as("bit"))
      .select(expr("CAST(bit div 64 AS INT)").as("w"),
        shim.column(org.apache.spark.sql.catalyst.expressions.ShiftLeft(
          shim.expression(lit(1L)),
          shim.expression((col("bit") % 64).cast("int")))).as("mask"))
      .groupBy(col("w"))
      .agg(expr("bit_or(mask)").as("word"), count(lit(1)).as("nbits"))
      .collect()
    // every key row contributes exactly k bit rows ⇒ key-row count
    // (an upper bound on distinct keys) falls out of the same pass
    val nKeysUB = wordRows.iterator.map(_.getLong(2)).sum / math.max(k, 1)
    // ~16 bits/key keeps fp under ~1% at k=3; clamp to [2^18, 2^25]
    val m =
      if (mBits > 0) mBits
      else {
        val want = java.lang.Long.highestOneBit(
          math.max(1L, nKeysUB * 16) * 2 - 1)
        math.min(1L << 25, math.max(1L << 18, want)).toInt
      }
    val words = new Array[Long](m / 64)
    wordRows.foreach(r => words(r.getInt(0) % (m / 64)) |= r.getLong(1))
    (words, nKeysUB)
  }

  /** HLL set algebra over two segments — |A|, |B|, |A∪B| from register
    * tables and |A∩B| by inclusion-exclusion, the standard audience-
    * overlap / cross-segment-reach estimator. Registers are linear
    * under union (per-bucket max), so |A∪B| needs NO third pass over
    * the data: one grouped register build (≤ 2m rows shuffle, map-side
    * max) serves both per-segment estimates AND the merged sketch.
    * All estimator arithmetic is the integer-exact chain of
    * [[hllEstimateFromRegs]], replayable bit-identically by the oracle.
    * The exact comparators (the gate's ground truth — production drops
    * them) also avoid any pair join: over the A∪B-filtered input,
    * exact |A∩B| = |A| + |B| − |A∪B| by the same inclusion-exclusion,
    * from ONE distinct-key pass carrying per-segment flags (NOT a
    * multi-COUNT(DISTINCT) aggregate — that form Expands 3×|rows| into
    * the shuffle and measured 73 s at 100M events vs 5.1 s for this).
    */
  def hllSetOps(df: DataFrame, segCol: Column, key: Column,
                segA: String, segB: String, p: Int = 8): DataFrame = {
    require(p == 8, "estimator constant α is instantiated for p=8")
    val m = 1 << p
    val w = 32 - p
    val pows = (0 to w + 1).map(i => 1L << ((w + 1) - i)).toArray
    // NULL keys are excluded up front so the grouped exact pass keeps
    // countDistinct semantics (a groupBy would otherwise count a NULL
    // key as one extra distinct value in every branch)
    val sub = df.filter(segCol.isin(segA, segB) && key.isNotNull)
      .select(segCol.as("g"), key.as("k"))
    // ONE register build feeds three estimator branches; Catalyst does
    // not share the scan subtree across them (house precedent:
    // perplexityBuckets), so materialize the ≤2m-row table once
    val regs = hllGroupedRegisters(sub, col("g"), col("k"), p)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def estOf(r: DataFrame, name: String): DataFrame =
      r.agg(count(lit(1)).as("nb"),
          sum(element_at(typedLit(pows), col("register") + 1)).as("sp"))
        .withColumn("ss", col("sp") + (lit(m.toLong) - col("nb")) * (1L << (w + 1)))
        .withColumn("q1",
          expr(s"CAST(${m.toLong * m * (1L << (w + 1))} AS BIGINT) div ss"))
        .select(expr("(71827 * q1) div 100000").as(name))
    val estA = estOf(regs.filter(col("g") === segA), "est_a")
    val estB = estOf(regs.filter(col("g") === segB), "est_b")
    val estU = estOf(regs.groupBy(col("bucket"))
      .agg(max(col("register")).as("register")), "est_union")
    // exact comparators WITHOUT the multi-countDistinct Expand (3
    // count-distincts in one aggregate triple the shuffle: 3x|rows|
    // expanded rows vs ONE |distinct keys| shuffle here — measured
    // 73 s -> 5.1 s at 100M events): one pass to per-key segment flags,
    // then a single-row fold
    val exact = sub
      .groupBy(col("k"))
      .agg(max(when(col("g") === segA, 1L).otherwise(0L)).as("ia"),
        max(when(col("g") === segB, 1L).otherwise(0L)).as("ib"))
      .agg(sum(col("ia")).as("exact_a"), sum(col("ib")).as("exact_b"),
        count(lit(1)).as("exact_union"))
    val out = estA.crossJoin(broadcast(estB)).crossJoin(broadcast(estU)).crossJoin(broadcast(exact))
      .withColumn("est_inter",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
      .withColumn("exact_inter",
        col("exact_a") + col("exact_b") - col("exact_union"))
      .select(col("est_a"), col("est_b"), col("est_union"), col("est_inter"),
        col("exact_a"), col("exact_b"), col("exact_union"), col("exact_inter"),
        (abs(col("est_union") - col("exact_union")) * 5
          <= col("exact_union")).as("ok_union"),
        // inclusion-exclusion compounds three sketch errors, each
        // O(1.04/√m) of ITS set size — the honest bound is relative to
        // the union, not the (possibly tiny) intersection
        (abs(col("est_inter") - col("exact_inter")) * 4
          <= col("exact_union")).as("ok_inter"))
    // The result is ONE row: collect it eagerly and free the register
    // cache before returning (the Triangles.run pre-collect pattern) —
    // otherwise every invocation leaks a persisted ≤2m-row relation.
    val resultRows = out.collect()
    regs.unpersist(blocking = false)
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(resultRows: _*), out.schema)
  }

  /** Production half of [[hllSetOps]] — register merge ONLY, the shape
    * a 100 TB audience-overlap estimate actually runs (the exact
    * comparators are the GATE's ground truth and never ship): |A|, |B|,
    * |A∪B| estimates and the inclusion-exclusion |A∩B|, all from one
    * register build. Stage shape is the `x_sketch_hll_build` class, not
    * the gate's ~10-stage fan: ONE scan computes the packed
    * bucket‖rank, ONE ≤m-row bucket aggregate carries BOTH per-segment
    * maxima AND the union register in the same pass (union = max over
    * segments, so it needs no second grouping, let alone a third data
    * pass), and ONE single-row aggregate folds the three estimator
    * sums. No persist, no crossJoins, nothing driver-side but the
    * 1-row result. Estimator arithmetic is the integer-exact
    * [[hllEstimateFromRegs]] chain, bit-replayable by the oracle.
    */
  def hllSetOpsEstimates(df: DataFrame, segCol: Column, key: Column,
                         segA: String, segB: String,
                         p: Int = 8): DataFrame = {
    require(p == 8, "estimator constant α is instantiated for p=8")
    val m = 1 << p
    val w = 32 - p
    val pows = (0 to w + 1).map(i => 1L << ((w + 1) - i)).toArray
    val isLong = df.select(key.as("__k")).schema.head.dataType ==
      org.apache.spark.sql.types.LongType
    val packed = org.apache.spark.sql.graftshim.shim.column(
      graft.functions.HllBucketRank(
        org.apache.spark.sql.graftshim.shim.expression(
          if (isLong) key else key.cast("string")), p))
    val rho = expr("CAST(pk % 64 AS INT)")
    val one = df.filter(segCol.isin(segA, segB))
      .select(segCol.as("g"), packed.as("pk"))
      .groupBy(expr("CAST(pk div 64 AS BIGINT)").as("bucket"))
      .agg(max(when(col("g") === segA, rho)).as("ra"),
        max(when(col("g") === segB, rho)).as("rb"),
        max(rho).as("ru"))
      .agg(count(col("ra")).as("nb_a"),
        sum(element_at(typedLit(pows), col("ra") + 1)).as("sp_a"),
        count(col("rb")).as("nb_b"),
        sum(element_at(typedLit(pows), col("rb") + 1)).as("sp_b"),
        count(col("ru")).as("nb_u"),
        sum(element_at(typedLit(pows), col("ru") + 1)).as("sp_u"))
    def est(sfx: String) = expr(
      s"(71827 * (CAST(${m.toLong * m * (1L << (w + 1))} AS BIGINT) div " +
        s"(sp_$sfx + ($m - nb_$sfx) * ${1L << (w + 1)}))) div 100000")
    one.select(est("a").as("est_a"), est("b").as("est_b"),
        est("u").as("est_union"))
      .withColumn("est_inter",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
  }
}
