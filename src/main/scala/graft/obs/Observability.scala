package graft.obs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Observability analytics over the engine's log/metric/trace rows — the
  * query side of the reference's telemetry pipeline (the reference ships
  * the data with out_prometheus_exporter / out_opentelemetry and leaves
  * analysis to a TSDB; here the engine answers those queries itself,
  * Spark-first).
  *
  * Semantics follow the public art: PromQL counter `rate`/`increase`
  * reset handling (Prometheus docs; the reference's
  * plugins/filter_log_to_metrics + processor cumulative_to_delta produce
  * exactly such counters — cmt_counter in cmetrics), HDR-histogram-style
  * base-2 bucketing (hdrhistogram.org public spec), Drain-style log
  * template mining (He et al., ICWS 2017), the two-window SLO burn-rate
  * alert (Google SRE Workbook ch. 5, public), and the OTLP span
  * parent→child service graph (reference
  * plugins/in_opentelemetry/opentelemetry_prot.c span model).
  *
  * Every operator is integer-exact (cents / nanoseconds / cross-
  * multiplied ratios) so a SQL oracle replays results bit-for-bit.
  *
  * Scale notes are per-operator; the common spine is: one keyed window
  * shuffle (the TSDB series layout) or one keyed equi-join, partial
  * aggregation map-side, and never a driver-side collect of record data.
  */
object Observability {

  /** Exact integer cents from a 2-decimal DOUBLE column (DECIMAL round-trip
    * — replayed by `CAST(CAST(v AS DECIMAL(18,2))*100 AS BIGINT)`).
    */
  def cents(value: Column): Column =
    (value.cast("decimal(18,2)") * lit(100)).cast("long")

  /** PromQL-style counter increase/rate per (series, bucket).
    *
    * Input rows are monotone-counter SAMPLES (series, orderNs, orderId,
    * counter). Reset rule (Prometheus): delta = counter - prev; a negative
    * delta means the counter restarted from zero, so the increase
    * contributed is the post-reset value itself. The first sample of a
    * series contributes 0 (no extrapolation — the exact-arithmetic subset
    * of PromQL's rate()).
    *
    * Scale: ONE window shuffle keyed by series — the classic TSDB series
    * sharding; series cardinality is the parallelism, per-series state is
    * a sort. Bucket aggregation after it is map-side (rows already
    * series-local). rate_per_sec = increase/bucket_seconds on identical
    * integer operands → identical IEEE doubles in any engine.
    */
  def counterRate(samples: DataFrame, series: Column, tsNs: Column,
                  ordId: Column, counter: Column,
                  bucketUs: Long): DataFrame = {
    val withPrev = samples.select(
        series.as("series"), tsNs.as("ts_ns"), ordId.as("ord"),
        counter.as("counter"))
      .withColumn("prev", lag(col("counter"), 1).over(
        Window.partitionBy(col("series")).orderBy(col("ts_ns"), col("ord"))))
    val inc = when(col("prev").isNull, lit(0L))
      .when(col("counter") < col("prev"), col("counter"))
      .otherwise(col("counter") - col("prev"))
    withPrev
      .withColumn("bucket_us",
        expr(s"(ts_ns div 1000 div $bucketUs) * $bucketUs"))
      .groupBy(col("series"), col("bucket_us"))
      .agg(sum(inc).as("increase_cents"),
        count(lit(1)).as("n_samples"))
      .withColumn("rate_per_sec",
        col("increase_cents").cast("double") / lit(bucketUs / 1000000.0 * 100.0))
  }

  /** HDR-histogram-style sketch quantiles per series.
    *
    * Bucket = value with all but the top (1+subBits) significant bits
    * zeroed: shift = max(bitlen(v) - 1 - subBits, 0), lo = (v>>shift)<<shift
    * — pure integer math, replayable in SQL via
    * `length(format('{:b}', v))` for bitlen. 2^subBits sub-buckets per
    * octave bounds relative error at 2^-subBits.
    *
    * Scale: the histogram compacts to ≤ 64·2^subBits rows per series
    * BEFORE the shuffle (partial agg map-side); the quantile select is the
    * exact-rank cum/total pattern over those bounded rows — no global
    * sort of raw values anywhere, and the sketch rows are mergeable
    * across shards/time by summing counts.
    */
  def hdrQuantiles(df: DataFrame, series: Column, v: Column,
                   subBits: Int = 4,
                   qs: Seq[(String, Int, Int)] =
                     Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
      : DataFrame = {
    val clamped = greatest(v.cast("long"), lit(0L))
    val bucketed = df.select(series.as("series"), clamped.as("v"))
      .withColumn("shift",
        greatest(expr("length(bin(v))") - lit(1 + subBits), lit(0)))
      .withColumn("lo", expr("shiftleft(shiftright(v, shift), shift)"))
    val counts = bucketed.groupBy(col("series"), col("lo"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("series")).orderBy(col("lo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("series")).orderBy(col("lo"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("total", sum(col("cnt")).over(wAll))
      .select(col("series"), col("lo"), col("cum"), col("total"),
        explode(typedLit(qs)).as("q"))
      .withColumn("needed", expr("(total * q._2 + q._3 - 1) div q._3"))
      .filter(col("cum") >= col("needed"))
      .groupBy(col("series"), col("q._1").as("q"))
      .agg(min(col("needed")).as("rank_needed"),
        min(col("lo")).as("bucket_lo"))
  }

  /** Drain-style log template mining: mask the variable tokens (long hex
    * runs, then digit runs), group identical masks. The mask pass is
    * map-only codegen regexp; the groupBy shuffles one row per
    * (template, partition) thanks to partial aggregation — template
    * cardinality, not line count, crosses the wire.
    */
  def logTemplates(df: DataFrame, line: Column, user: Column): DataFrame = {
    val template = regexp_replace(
      regexp_replace(line, "[0-9a-f]{20,}", "<HEX>"), "[0-9]+", "<N>")
    df.select(template.as("template"), line.as("line"), user.as("u"))
      .groupBy(col("template"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("u")).as("n_users"),
        min(col("line")).as("first_line"))
  }

  /** Service dependency graph from spans: child joins its parent span on
    * (trace_id, parent_span_id = span_id) — the arrival-order-free way
    * OTLP span trees are assembled — then edges aggregate to
    * (client_service, server_service) with call counts and latency sums.
    *
    * Scale: ONE shuffle equi-join keyed by (trace_id, span_id); traces
    * are small and uniformly hashed so no skew; edge agg is map-side
    * partial (edge cardinality = |services|²).
    */
  def serviceGraph(spans: DataFrame): DataFrame =
    serviceGraph(spans, spans)

  /** Two-sided variant: when `spans`' parent_span_id column is derived
    * through an expensive subtree (a window, a parse), pass the raw span
    * table as `parentSide` so the parent branch skips that work —
    * Catalyst does not share the subtree across the self-join, so
    * without this the derivation runs twice.
    */
  def serviceGraph(spans: DataFrame, parentSide: DataFrame): DataFrame = {
    // Both sides cluster by trace_id ALONE: spans of one trace land in
    // one partition and the (parent_span_id = span_id) match happens
    // in-partition. The default plan would reshuffle BOTH ~|spans|
    // sides on the composite (trace, span) key — and when the child
    // side arrives from a trace-keyed window (the common shape), that
    // exchange is pure waste. Subset co-partitioning needs
    // spark.sql.requireAllClusterKeysForCoPartition=false (set by the
    // session owner; the plan is correct either way, just cheaper).
    val parents = parentSide.select(col("trace_id").as("p_trace"),
      col("span_id").as("p_span"), col("service").as("client"),
      col("ts_ns").as("p_ts_ns"))
      .repartition(col("p_trace"))
    val children = spans.filter(col("parent_span_id").isNotNull)
      .select(col("trace_id"), col("parent_span_id"),
        col("service").as("server"), col("ts_ns"))
      .repartition(col("trace_id"))
    children.join(parents,
        col("trace_id") === col("p_trace") &&
          col("parent_span_id") === col("p_span"))
      .groupBy(col("client"), col("server"))
      .agg(count(lit(1)).as("n_calls"),
        sum(expr("(ts_ns - p_ts_ns) div 1000")).as("latency_us_sum"))
  }

  /** Two-window SLO burn-rate alert (SRE Workbook): per (service, 30-min
    * bucket) error counts, plus the rolling 12-bucket (6 h) sums; a page
    * fires when BOTH windows burn faster than the error budget.
    * budget = budgetNum/budgetDen (e.g. 1/50 = 2%); the comparison is the
    * integer cross-multiply errors·den > total·num — no ratio division.
    *
    * Scale: bucket partials are map-side; the rolling window is keyed by
    * service over ALREADY-AGGREGATED bucket rows (≤ |services|·buckets),
    * so the second shuffle carries partials, never events.
    */
  def sloBurn(df: DataFrame, service: Column, tsNs: Column, isError: Column,
              bucketUs: Long = 1800000000L, budgetNum: Int = 1,
              budgetDen: Int = 50, longBuckets: Int = 12): DataFrame = {
    val buckets = df.select(service.as("service"), tsNs.as("ts_ns"),
        isError.cast("long").as("err"))
      .withColumn("bucket_us",
        expr(s"(ts_ns div 1000 div $bucketUs) * $bucketUs"))
      .groupBy(col("service"), col("bucket_us"))
      .agg(count(lit(1)).as("total"), sum(col("err")).as("errors"))
    val wLong = Window.partitionBy(col("service")).orderBy(col("bucket_us"))
      .rowsBetween(-(longBuckets - 1), Window.currentRow)
    buckets
      .withColumn("long_total", sum(col("total")).over(wLong))
      .withColumn("long_errors", sum(col("errors")).over(wLong))
      .withColumn("burn_short",
        col("errors") * budgetDen > col("total") * budgetNum)
      .withColumn("burn_long",
        col("long_errors") * budgetDen > col("long_total") * budgetNum)
      .withColumn("page", col("burn_short") && col("burn_long"))
  }

  /** Ordered conversion funnel stage1→stage2→stage3, each step within
    * `horizonNs` of the previous: t1 = first stage1 event, t2 = first
    * stage2 in (t1, t1+h], t3 = first stage3 in (t2, t2+h]. Emits one row
    * per funnel depth with user counts and exact step-latency sums.
    *
    * Scale: all three stage times are conditional-min WINDOW aggregates
    * over the SAME user partition — one exchange, one sort, three window
    * passes (each references the previous pass's column); the per-user
    * collapse reuses that partitioning and the final depth rollup is
    * four rows.
    */
  def funnel(df: DataFrame, user: Column, tsNs: Column, stage: Column,
             s1: String, s2: String, s3: String, horizonNs: Long): DataFrame = {
    // ONE user-clustered in-partition-sorted streaming pass runs the
    // ordered 3-stage machine per user with O(1) carry state (t1 = the
    // user's first s1; t2 = first s2 strictly after t1 within the
    // horizon; t3 likewise after t2 — first-in-time ≡ the conditional
    // mins the r9 window formulation computed in THREE WindowExec
    // passes plus a 60M-row per-user hash collapse over the same
    // exchange). Ties need no ordinal tie-break: stages chain on
    // STRICTLY-greater timestamps, so equal-ts events cannot chain and
    // min-of-equal-ts is ts either way. Same sanctioned mapPartitions
    // exception as [[transitions]]: run-length semantics over a sorted
    // stream. The streaming twin ([[graft.streaming.Stateful
    // .funnelStream]]) is this exact machine with the carry state in
    // GroupState.
    val ordered = df.select(user.as("u"), tsNs.cast("long").as("t"),
        stage.as("st"))
      .repartition(col("u"))
      .sortWithinPartitions(col("u"), col("t"))
    val perUser = ordered.mapPartitions { rows =>
      var have = false
      var curU: Any = null
      var t1 = -1L; var t2 = -1L; var t3 = -1L
      def result(): (Int, Long, Long) = {
        val depth = if (t3 >= 0) 3 else if (t2 >= 0) 2
          else if (t1 >= 0) 1 else 0
        (depth, if (t2 >= 0) t2 - t1 else 0L, if (t3 >= 0) t3 - t2 else 0L)
      }
      val main = rows.flatMap { r =>
        val u = r.get(0)
        val t = r.getLong(1)
        val st = r.getString(2)
        val emit =
          if (have && u != curU) Iterator.single(result())
          else Iterator.empty
        if (!have || u != curU) {
          curU = u; have = true; t1 = -1L; t2 = -1L; t3 = -1L
        }
        if (st == s1) { if (t1 < 0) t1 = t }
        else if (st == s2) {
          if (t1 >= 0 && t2 < 0 && t > t1 && t <= t1 + horizonNs) t2 = t
        } else if (st == s3) {
          if (t2 >= 0 && t3 < 0 && t > t2 && t <= t2 + horizonNs) t3 = t
        }
        emit
      }
      main ++ new Iterator[(Int, Long, Long)] {
        override def hasNext: Boolean = have
        override def next(): (Int, Long, Long) = { have = false; result() }
      }
    }(org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaInt,
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong))
      .toDF("depth", "s12", "s23")
    perUser
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_users"),
        // ns sums overflow Long past ~9.2e18 (≈5M user-weeks); DECIMAL(38)
        // keeps the sum exact at any corpus size. Depth-0/1/2 groups have
        // no observed step latency: the pass emits 0 (and coalesce keeps
        // an all-empty group at 0, not NULL — engine-specific NULL-decimal
        // canonicalization must not reach downstream comparisons).
        coalesce(sum(col("s12").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("step12_ns_sum"),
        coalesce(sum(col("s23").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("step23_ns_sum"))
  }

  /** Retention cohorts: cohort = the user's first active day; one output
    * row per (cohort_day, day_offset) with distinct active users.
    *
    * Scale: the first-day window and the (user, day) dedup share the
    * user-keyed partitioning (one exchange feeds both); the final rollup
    * aggregates the deduped pairs — bounded by users·active-days, with
    * map-side partials.
    */
  def retentionCohorts(df: DataFrame, user: Column, tsNs: Column): DataFrame = {
    val w = Window.partitionBy(col("u"))
    df.select(user.as("u"), tsNs.as("tn"))
      .withColumn("day", expr("tn div 86400000000000"))
      .withColumn("cohort_day", min(col("day")).over(w))
      .groupBy(col("u"), col("cohort_day"), col("day")).agg(count(lit(1)).as("_n"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Trending top-k: per time bucket, the k keys with the highest event
    * count, total-ordered (count desc, key asc) so ties are stable.
    *
    * Scale: the count aggregate partial-combines map-side (the shuffle
    * carries (bucket, key) partials, not events); the rank window runs
    * over ALREADY-AGGREGATED rows and Spark's WindowGroupLimit pushes
    * the k-cutoff map-side below the rank exchange — a hot bucket costs
    * a bounded heap, never a full sort of its keys.
    */
  def trending(df: DataFrame, key: Column, tsNs: Column,
               bucketNs: Long = 86400000000000L, k: Int = 3): DataFrame = {
    val counts = df.select(key.as("key"), tsNs.as("tn"))
      .withColumn("day", expr(s"tn div $bucketNs"))
      .groupBy(col("day"), col("key")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("day"))
      .orderBy(col("cnt").desc, col("key"))
    counts.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("day"), col("rk"), col("key"), col("cnt"))
  }

  /** HDR sketch rollup: fine-granularity histogram rows merge to coarse
    * buckets by SUMMING counts — the TSDB compaction story (a linear
    * sketch: merge of shards/windows is cell-wise addition, so 10-min
    * sketch rows roll into 1-hour quantiles without touching raw data).
    * Output: exact-rank quantiles per (series, coarse window) computed
    * from the MERGED histogram.
    */
  def hdrRollup(df: DataFrame, series: Column, tsNs: Column, v: Column,
                subBits: Int = 4, fineUs: Long = 600000000L,
                factor: Int = 6,
                qs: Seq[(String, Int, Int)] =
                  Seq(("p50", 1, 2), ("p99", 99, 100))): DataFrame = {
    val clamped = greatest(v.cast("long"), lit(0L))
    val fine = df.select(series.as("series"), tsNs.as("tn"),
        clamped.as("v"))
      .withColumn("fine", expr(s"tn div 1000 div $fineUs"))
      .withColumn("shift",
        greatest(expr("length(bin(v))") - lit(1 + subBits), lit(0)))
      .withColumn("lo", expr("shiftleft(shiftright(v, shift), shift)"))
      .groupBy(col("series"), col("fine"), col("lo"))
      .agg(count(lit(1)).as("cnt")) // the 10-min sketch rows
    val coarse = fine
      .withColumn("hour_us", expr(s"(fine div $factor) * $factor * $fineUs"))
      .groupBy(col("series"), col("hour_us"), col("lo"))
      .agg(sum(col("cnt")).as("cnt")) // sketch merge = cell-wise add
    val wCum = Window.partitionBy(col("series"), col("hour_us"))
      .orderBy(col("lo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("series"), col("hour_us"))
      .orderBy(col("lo"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    coarse
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("total", sum(col("cnt")).over(wAll))
      .select(col("series"), col("hour_us"), col("lo"), col("cum"),
        col("total"), explode(typedLit(qs)).as("q"))
      .withColumn("needed", expr("(total * q._2 + q._3 - 1) div q._3"))
      .filter(col("cum") >= col("needed"))
      .groupBy(col("series"), col("hour_us"), col("q._1").as("q"))
      .agg(min(col("needed")).as("rank_needed"),
        min(col("lo")).as("bucket_lo"))
  }

  /** Next-event transition matrix (first-order Markov over user
    * journeys): P(next=b | cur=a) per ordered event pair, carried as the
    * exact integer fraction n_ab / n_a·(out-transitions). One user-keyed
    * lag window (same exchange family as sessionize/funnel), then a
    * pair aggregate over |stages|² keys.
    */
  def transitions(df: DataFrame, user: Column, tsNs: Column,
                  ordId: Column, stage: Column): DataFrame = {
    // (tn, oid) is a TOTAL order — a duplicate timestamp within a user
    // must not make the successor nondeterministic.
    //
    // Pair formation is ONE streaming pass over a user-clustered,
    // in-partition-sorted stream (the same exchange+sort a lead()
    // window needs) — but with O(1) carry state instead of WindowExec's
    // per-user row buffering, and the |stages|²-key count aggregate
    // runs on the pass's output directly. The mapPartitions here is the
    // sanctioned exception to the no-RDD-logic rule: adjacent-pair
    // run-length semantics over a sorted stream, nothing more.
    val spark = df.sparkSession
    val ordered = df.select(user.as("u"), tsNs.as("tn"), ordId.as("oid"),
        stage.as("cur"))
      .repartition(col("u"))
      .sortWithinPartitions(col("u"), col("tn"), col("oid"))
      .select(col("u"), col("cur"))
    val pairs = ordered.mapPartitions { it =>
      var first = true
      var prevU: Any = null
      var prevCur: String = null
      it.flatMap { r =>
        val u = r.get(0)
        val cur = r.getString(1)
        val out =
          if (!first && u == prevU) Iterator.single((prevCur, cur))
          else Iterator.empty
        first = false; prevU = u; prevCur = cur
        out
      }
    }(org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.STRING))
      .toDF("cur", "nxt")
    val counts = pairs.groupBy(col("cur"), col("nxt"))
      .agg(count(lit(1)).as("n_pair"))
    val wTot = Window.partitionBy(col("cur"))
    counts
      .withColumn("n_from", sum(col("n_pair")).over(wTot))
      .withColumn("p",
        col("n_pair").cast("double") / col("n_from").cast("double"))
  }

  /** Burst detection: a bucket bursts when its event count exceeds
    * `num/den` × the trailing `lookback`-bucket average — compared by
    * integer cross-multiply against the ACTUAL trailing count (so the
    * warm-up buckets scale correctly instead of comparing against
    * zero-padded history). Rolling window runs over aggregated bucket
    * rows, never events.
    */
  def burst(df: DataFrame, service: Column, tsNs: Column,
            bucketUs: Long = 600000000L, num: Int = 3, den: Int = 1,
            lookback: Int = 12): DataFrame = {
    val buckets = df.select(service.as("service"), tsNs.as("ts_ns"))
      .withColumn("bucket_us",
        expr(s"(ts_ns div 1000 div $bucketUs) * $bucketUs"))
      .groupBy(col("service"), col("bucket_us"))
      .agg(count(lit(1)).as("cnt"))
    val wPrev = Window.partitionBy(col("service")).orderBy(col("bucket_us"))
      .rowsBetween(-lookback, -1)
    buckets
      .withColumn("prev_sum", sum(col("cnt")).over(wPrev))
      .withColumn("prev_n", count(col("cnt")).over(wPrev))
      .withColumn("is_burst",
        col("prev_n") > 0 &&
          col("cnt") * col("prev_n") * den > col("prev_sum") * num)
      .withColumn("prev_sum", coalesce(col("prev_sum"), lit(0L)))
  }

  /** Position-based multi-touch attribution (the 40/20/40 model):
    * each conversion credits its lookback-window touches — 4000 bp to
    * the first, 4000 bp to the last, the middle 2000 bp split evenly
    * (integer floor; a single touch takes all 10000). The touch set
    * per conversion comes from a keyed interval join (equi-join on
    * user with the window as a filter — never a range-only join), and
    * first/last/count are three window expressions over ONE
    * conversion-keyed exchange.
    */
  def attribution(touches: DataFrame, conversions: DataFrame,
                  horizonNs: Long): DataFrame = {
    val joined = touches.join(conversions,
      col("t_user") === col("c_user") &&
        col("t_ts") < col("c_ts") &&
        col("t_ts") >= col("c_ts") - horizonNs)
    val w = Window.partitionBy(col("conv_id"))
    val wAsc = w.orderBy(col("t_ts"), col("touch_id"))
    val wDesc = w.orderBy(col("t_ts").desc, col("touch_id").desc)
    joined
      .withColumn("rk_first", row_number().over(wAsc))
      .withColumn("rk_last", row_number().over(wDesc))
      .withColumn("n_touches", count(lit(1)).over(w))
      .withColumn("role",
        when(col("n_touches") === 1, "only")
          .when(col("rk_first") === 1, "first")
          .when(col("rk_last") === 1, "last")
          .otherwise("middle"))
      // credits always sum to exactly 10000 bp per conversion: a 2-touch
      // conversion splits 5000/5000 (there is no middle bucket to carry
      // the 2000), and the middle floor-div remainder goes to the FIRST
      // middle touch (rk_first = 2) deterministically
      .withColumn("credit_bp",
        when(col("role") === "only", 10000L)
          .when(col("n_touches") === 2, 5000L)
          .when(col("role") === "middle",
            expr("2000 div (n_touches - 2)") +
              when(col("rk_first") === 2,
                expr("2000 % (n_touches - 2)")).otherwise(0L))
          .otherwise(4000L))
      .select(col("conv_id"), col("touch_id"), col("role"),
        col("credit_bp"), col("n_touches"))
  }

  /** Top-N-plus-other rollup: the dashboard cut — per bucket keep the
    * N busiest keys by name and fold the tail into 'other'. Rank runs
    * over aggregated partials; the re-aggregate touches ≤ |keys| rows.
    */
  def topNOther(df: DataFrame, key: Column, tsNs: Column,
                bucketNs: Long = 86400000000000L, n: Int = 3): DataFrame = {
    val ranked = trending(df, key, tsNs, bucketNs, k = Int.MaxValue)
    ranked
      .withColumn("label", when(col("rk") <= n, col("key"))
        .otherwise(lit("other")))
      .groupBy(col("day"), col("label"))
      .agg(sum(col("cnt")).as("cnt"), count(lit(1)).as("n_keys"))
  }

  /** Share-of-total and day-over-day share shift, in integer basis
    * points: share_bp = cnt·10⁴ div day_total; delta vs the key's
    * previous bucket via lag. Two window passes over aggregated rows.
    */
  def shareShift(df: DataFrame, key: Column, tsNs: Column,
                 bucketNs: Long = 86400000000000L): DataFrame = {
    val counts = df.select(key.as("key"), tsNs.as("tn"))
      .withColumn("day", expr(s"tn div $bucketNs"))
      .groupBy(col("day"), col("key")).agg(count(lit(1)).as("cnt"))
    val wDay = Window.partitionBy(col("day"))
    val wKey = Window.partitionBy(col("key")).orderBy(col("day"))
    counts
      .withColumn("day_total", sum(col("cnt")).over(wDay))
      .withColumn("share_bp", expr("(cnt * 10000) div day_total"))
      .withColumn("prev_share_bp", lag(col("share_bp"), 1).over(wKey))
      .withColumn("delta_bp", col("share_bp") - col("prev_share_bp"))
  }

  /** Alert hysteresis (flap suppression): an alert FIRES after
    * `fireAfter`=3 consecutive bursting buckets and RESOLVES after
    * `resolveAfter`=2 consecutive quiet ones; `active` holds between.
    * The state machine is expressed as pure window algebra — fire/
    * resolve events from lag conjunctions, then "most recent event
    * wins" as two running maxima compared — so it is deterministic,
    * SQL-replayable, and needs only the one service-keyed exchange the
    * bucket rows already have.
    */
  def alertHysteresis(flags: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("service")).orderBy(col("bucket_us"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val b = col("is_burst")
    flags
      .withColumn("fire", coalesce(b && lag(b, 1).over(w) &&
        lag(b, 2).over(w), lit(false)))
      .withColumn("resolve", coalesce(!b && !lag(b, 1).over(w), lit(false)))
      .withColumn("fired_at",
        max(when(col("fire"), col("bucket_us"))).over(wCum))
      .withColumn("resolved_at",
        max(when(col("resolve"), col("bucket_us"))).over(wCum))
      .withColumn("active", col("fired_at").isNotNull &&
        (col("resolved_at").isNull || col("fired_at") > col("resolved_at")))
      .select(col("service"), col("bucket_us"), b.as("is_burst"),
        col("fired_at"), col("resolved_at"), col("active"))
  }

  /** Apdex score (the public Apdex spec): satisfied ≤ T, tolerating ≤ 4T,
    * frustrated above; score = (sat + tol/2) / total, carried as the
    * exact integer fraction (2·sat + tol) / 2·total plus the IEEE
    * division of those exact operands. One aggregate, map-side partials.
    */
  def apdex(df: DataFrame, service: Column, v: Column, t: Long): DataFrame =
    df.select(service.as("service"), v.as("v"))
      .groupBy(col("service"))
      .agg(
        sum((col("v") <= t).cast("long")).as("satisfied"),
        sum((col("v") > t && col("v") <= 4 * t).cast("long"))
          .as("tolerating"),
        sum((col("v") > 4 * t).cast("long")).as("frustrated"),
        count(lit(1)).as("total"))
      .withColumn("score_num", col("satisfied") * 2 + col("tolerating"))
      .withColumn("score_den", col("total") * 2)
      .withColumn("apdex",
        col("score_num").cast("double") / col("score_den").cast("double"))

  /** Median / MAD (median absolute deviation) outlier detection per group
    * — the robust z-score: flag v where |v - median| > k·MAD. Lower
    * medians (rank ⌈n/2⌉) keep everything integer-exact.
    *
    * Scale: both medians run on VALUE-HISTOGRAM rows (groupBy (g, v)
    * count — bounded by distinct values, partial-agg'd map-side), the
    * exact-rank select is the same cum/total pattern as
    * [[graft.ops.Quantiles]]; the two model joins carry one row per
    * group and broadcast under AQE.
    */
  def anomalyMad(df: DataFrame, group: Column, v: Column,
                 k: Int = 5): DataFrame = {
    def medianOf(in: DataFrame): DataFrame = {
      val counts = in.groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("g")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      counts
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("total", sum(col("cnt")).over(wAll))
        .withColumn("needed", expr("(total + 1) div 2"))
        .filter(col("cum") >= col("needed"))
        .groupBy(col("g")).agg(min(col("v")).as("med"))
    }
    val base = df.select(group.as("g"), v.cast("long").as("v"))
    val med = medianOf(base)
    val withMed = base.join(med, "g")
    val dev = withMed.select(col("g"), abs(col("v") - col("med")).as("v"))
    val mad = medianOf(dev).withColumnRenamed("med", "mad")
    withMed.join(mad, "g")
      .groupBy(col("g").as("service"))
      .agg(min(col("med")).as("median_v"), min(col("mad")).as("mad_v"),
        count(lit(1)).as("n_total"),
        sum((abs(col("v") - col("med")) > col("mad") * k).cast("long"))
          .as("n_outliers"))
  }
}
