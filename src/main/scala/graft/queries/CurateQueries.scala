package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.text.TextAnalysis

/** Corpus-curation gates, batch 2: heavy-set boilerplate stripping,
  * Bloom-pruned semi-joins, HLL set algebra, epoch-repeat mixing. Each
  * is the 100 TB-shaped variant of a pattern the suite already gates in
  * its exact form — the point here is WHICH side of the frequency/key
  * table travels (broadcast blacklist, driver bitset, register table,
  * |domains|-row rates) while the corpus stays map-side.
  */
object CurateQueries {

  def all: Seq[GraftQuery] = Seq(

    // Boilerplate strip: 20-word chunks occurring in >= 3 DISTINCT docs
    // are removed everywhere (CCNet "common lines" at chunk grain). The
    // blacklist is vocabulary-scale -> broadcast; bodies never shuffle.
    GraftQuery(
      "x_dedup_boilerplate",
      (s, dir) =>
        graft.dedup.Dedup.boilerplateStrip(Tables.documents(s, dir),
          col("doc_id"), col("text")),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
                         FROM documents),
             ix AS (SELECT doc_id, w,
                           unnest(range(0, CAST(ceil(len(w) / 20.0)
                                                AS BIGINT))) AS i
                    FROM d),
             p AS (SELECT doc_id, i,
                          array_to_string(w[i*20+1:i*20+20], ' ') AS chunk
                   FROM ix),
             hv AS (SELECT chunk
                    FROM (SELECT chunk, count(DISTINCT doc_id) AS nd
                          FROM p GROUP BY 1)
                    WHERE nd >= 3),
             b AS (SELECT p.doc_id, p.i, p.chunk,
                          (hv.chunk IS NOT NULL) AS boiler
                   FROM p LEFT JOIN hv ON p.chunk = hv.chunk)
             SELECT doc_id,
                    CAST(count(*) AS BIGINT) AS n_chunks,
                    CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END)
                         AS BIGINT) AS n_boiler,
                    coalesce(string_agg(CASE WHEN NOT boiler THEN chunk END,
                                        ' ' ORDER BY i), '') AS cleaned
             FROM b GROUP BY 1""")
    ),

    // Bloom-pruned semi-join: urgent orders' keys fold into a 32 KB
    // driver bitset, lineitem rows die map-side unless their orderkey
    // hits all k bits, and the exact residual join removes the false
    // positives — result identical to the plain semi-join the oracle
    // runs. The 100 TB shape of "filter the fact table by a dimension
    // subset too big to broadcast exactly".
    GraftQuery(
      "x_join_bloom",
      (s, dir) => {
        val urgent = Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        graft.sketch.Sketches.bloomPrunedSemiJoin(
            Tables.lineitem(s, dir), col("l_orderkey"),
            urgent, col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_quantity").cast("long")).as("sum_qty"))
      },
      Some("""SELECT l_returnflag,
                    CAST(count(*) AS BIGINT) AS n_rows,
                    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                      AS sum_qty
             FROM lineitem
             WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                  WHERE o_orderpriority = '1-URGENT')
             GROUP BY 1""")
    ),

    // Production half of the runtime filter in isolation: bitset build
    // + map-side probe, NO residual join — survivors INCLUDE the
    // bitset's deterministic false positives, and the oracle replays
    // the exact same Kirsch-Mitzenmacher math (h1||h2 = first 8 md5
    // bytes of the key's decimal rendering, bit_j = (h1 + j*h2) mod
    // 2^20) from SQL, so the survivor set hash-matches bit for bit.
    // This is the strongest check the bitset semantics can get — the
    // parent gate only proves false positives were cleaned up AFTER.
    GraftQuery(
      "x_join_bloom_probe",
      (s, dir) => {
        val urgent = Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        graft.sketch.Sketches.bloomProbeOnly(
            Tables.lineitem(s, dir), col("l_orderkey"),
            urgent, col("o_orderkey"), mBits = 1 << 20)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_quantity").cast("long")).as("sum_qty"))
      },
      Some("""WITH bh AS (SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                 1, 8))::BIGINT AS h1,
                                ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                 9, 8))::BIGINT AS h2
                         FROM orders WHERE o_orderpriority = '1-URGENT'),
             bits AS (SELECT DISTINCT (h1 + j * h2) % 1048576 AS b
                      FROM bh CROSS JOIN (VALUES (0), (1), (2)) t(j)),
             lh AS (SELECT l_returnflag, l_quantity,
                           ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),
                            1, 8))::BIGINT AS h1,
                           ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),
                            9, 8))::BIGINT AS h2
                    FROM lineitem),
             surv AS (SELECT l_returnflag, l_quantity
                      FROM lh
                      WHERE h1 % 1048576 IN (SELECT b FROM bits)
                        AND (h1 + h2) % 1048576 IN (SELECT b FROM bits)
                        AND (h1 + 2 * h2) % 1048576 IN (SELECT b FROM bits))
             SELECT l_returnflag,
                    CAST(count(*) AS BIGINT) AS n_rows,
                    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                      AS sum_qty
             FROM surv GROUP BY 1""")
    ),

    // HLL set algebra: distinct-user reach of 'click' vs 'view' and
    // their overlap by inclusion-exclusion on register estimates — the
    // audience-overlap estimator. One grouped register build (<=2m rows)
    // serves |A|, |B| and the per-bucket-max union sketch.
    GraftQuery(
      "x_sketch_hll_setops",
      (s, dir) =>
        graft.sketch.Sketches.hllSetOps(Tables.events(s, dir),
          col("event_type"), col("user_id"), "click", "view"),
      Some("""WITH e AS (SELECT event_type AS g, user_id AS k FROM events
                         WHERE event_type IN ('click', 'view')),
             h AS (SELECT g, ('0x' || substr(md5(CAST(k AS VARCHAR)),
                              1, 8))::BIGINT AS h
                   FROM e),
             r AS (SELECT g, h % 256 AS bucket,
                          CASE WHEN h // 256 = 0 THEN 25
                               ELSE 25 - length(bin(h // 256)) END AS rho
                   FROM h),
             regs AS (SELECT g, bucket, max(rho) AS register
                      FROM r GROUP BY 1, 2),
             ru AS (SELECT bucket, max(register) AS register
                    FROM regs GROUP BY 1),
             ea AS (SELECT (71827 * ((CAST(256 * 256 AS BIGINT) * (1::BIGINT << 25))
                      // (CAST(sum(1::BIGINT << (25 - register)) AS BIGINT)
                         + (256 - count(*)) * (1::BIGINT << 25)))) // 100000
                      AS est_a
                    FROM regs WHERE g = 'click'),
             eb AS (SELECT (71827 * ((CAST(256 * 256 AS BIGINT) * (1::BIGINT << 25))
                      // (CAST(sum(1::BIGINT << (25 - register)) AS BIGINT)
                         + (256 - count(*)) * (1::BIGINT << 25)))) // 100000
                      AS est_b
                    FROM regs WHERE g = 'view'),
             eu AS (SELECT (71827 * ((CAST(256 * 256 AS BIGINT) * (1::BIGINT << 25))
                      // (CAST(sum(1::BIGINT << (25 - register)) AS BIGINT)
                         + (256 - count(*)) * (1::BIGINT << 25)))) // 100000
                      AS est_union
                    FROM ru),
             ex AS (SELECT CAST(count(DISTINCT CASE WHEN g = 'click'
                                 THEN k END) AS BIGINT) AS exact_a,
                           CAST(count(DISTINCT CASE WHEN g = 'view'
                                 THEN k END) AS BIGINT) AS exact_b,
                           CAST(count(DISTINCT k) AS BIGINT) AS exact_union
                    FROM e)
             SELECT CAST(est_a AS BIGINT) AS est_a,
                    CAST(est_b AS BIGINT) AS est_b,
                    CAST(est_union AS BIGINT) AS est_union,
                    CAST(greatest(est_a + est_b - est_union, 0) AS BIGINT)
                      AS est_inter,
                    exact_a, exact_b, exact_union,
                    exact_a + exact_b - exact_union AS exact_inter,
                    abs(est_union - exact_union) * 5 <= exact_union
                      AS ok_union,
                    abs(greatest(est_a + est_b - est_union, 0)
                        - (exact_a + exact_b - exact_union)) * 4
                      <= exact_union AS ok_inter
             FROM ea, eb, eu, ex""")
    ),

    // Production half of the set-ops estimator: register merge ONLY
    // (the exact comparators above are the gate's ground truth and
    // never ship). One scan -> one <=256-row bucket aggregate carrying
    // per-segment maxima AND the union register -> one estimator row:
    // the x_sketch_hll_build stage class.
    GraftQuery(
      "x_sketch_hll_setops_regs",
      (s, dir) =>
        graft.sketch.Sketches.hllSetOpsEstimates(Tables.events(s, dir),
          col("event_type"), col("user_id"), "click", "view"),
      Some("""WITH e AS (SELECT event_type AS g, user_id AS k FROM events
                         WHERE event_type IN ('click', 'view')),
             h AS (SELECT g, ('0x' || substr(md5(CAST(k AS VARCHAR)),
                              1, 8))::BIGINT AS h
                   FROM e),
             r AS (SELECT g, h % 256 AS bucket,
                          CASE WHEN h // 256 = 0 THEN 25
                               ELSE 25 - length(bin(h // 256)) END AS rho
                   FROM h),
             b AS (SELECT bucket,
                          max(CASE WHEN g = 'click' THEN rho END) AS ra,
                          max(CASE WHEN g = 'view' THEN rho END) AS rb,
                          max(rho) AS ru
                   FROM r GROUP BY 1),
             agg AS (SELECT
                       count(ra) AS nb_a,
                       sum(CASE WHEN ra IS NOT NULL
                           THEN 1::BIGINT << (25 - ra) END) AS sp_a,
                       count(rb) AS nb_b,
                       sum(CASE WHEN rb IS NOT NULL
                           THEN 1::BIGINT << (25 - rb) END) AS sp_b,
                       count(ru) AS nb_u,
                       sum(CASE WHEN ru IS NOT NULL
                           THEN 1::BIGINT << (25 - ru) END) AS sp_u
                     FROM b),
             est AS (SELECT
                       (71827 * ((CAST(256 * 256 AS BIGINT) * (1::BIGINT << 25))
                         // (sp_a + (256 - nb_a) * (1::BIGINT << 25)))) // 100000
                         AS est_a,
                       (71827 * ((CAST(256 * 256 AS BIGINT) * (1::BIGINT << 25))
                         // (sp_b + (256 - nb_b) * (1::BIGINT << 25)))) // 100000
                         AS est_b,
                       (71827 * ((CAST(256 * 256 AS BIGINT) * (1::BIGINT << 25))
                         // (sp_u + (256 - nb_u) * (1::BIGINT << 25)))) // 100000
                         AS est_union
                     FROM agg)
             SELECT CAST(est_a AS BIGINT) AS est_a,
                    CAST(est_b AS BIGINT) AS est_b,
                    CAST(est_union AS BIGINT) AS est_union,
                    CAST(greatest(est_a + est_b - est_union, 0) AS BIGINT)
                      AS est_inter
             FROM est""")
    ),

    // Epoch-repeat mix: 2.0 effective epochs allocated by sqrt-flattened
    // domain weights — small domains repeat (n_copies >= 2), head
    // domains dilute below 1 copy, stochastic rounding on the 20-bit id
    // hash. Map-only after a |domains|-row broadcast.
    GraftQuery(
      "x_mix_epoch",
      (s, dir) => {
        val docs = Tables.documents(s, dir).withColumn("dom",
          concat(lit("d"), expr(
            "CAST(floor(sqrt(CAST(doc_id % 256 AS DOUBLE))) AS BIGINT)")
            .cast("string")))
        TextAnalysis.epochMix(docs, col("doc_id"), col("dom"))
      },
      Some("""WITH d AS (SELECT doc_id,
                     'd' || CAST(CAST(floor(sqrt(CAST(doc_id % 256 AS DOUBLE)))
                       AS BIGINT) AS VARCHAR) AS domain
                   FROM documents),
             c AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_d,
                     CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)
                       AS s_d
                   FROM d GROUP BY 1),
             n AS (SELECT CAST(sum(s_d) AS BIGINT) AS s_sum,
                          CAST(sum(n_d) AS BIGINT) AS n_total FROM c),
             t AS (SELECT domain, n_d,
                     CAST((2000 * n_total * s_d) // (s_sum * n_d) AS BIGINT)
                       AS r_milli
                   FROM c, n)
             SELECT d.doc_id, d.domain, t.n_d, t.r_milli,
                    CAST(t.r_milli // 1000 +
                      CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),
                             1, 5))::BIGINT * 1000
                           < (t.r_milli % 1000) * 1048576
                      THEN 1 ELSE 0 END AS BIGINT) AS n_copies
             FROM d JOIN t USING (domain)""")
    ),

    // Bottom-k hash-sample quantile sketch (KMV family): quantiles over
    // an UNBOUNDED value domain in bounded memory — where
    // x_quantiles_exact needs the domain to collapse into a histogram,
    // the bottom-4096-by-id-hash sample bounds state at k for ANY
    // domain (TakeOrdered: per-partition k-row heaps, values never
    // shuffle). The gate carries the exact ±5-centile bounds from the
    // cents histogram as ground truth; `ok` asserts the DKW O(1/√k)
    // rank error sits inside them. Deterministic end to end — the
    // oracle replays the identical hash sample and floor-rank pick.
    GraftQuery(
      "x_sketch_quantile_kmv",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val cents = graft.obs.Observability.cents(col("value"))
        val est = graft.sketch.Sketches.kmvQuantiles(
          ev, col("event_id"), cents)
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
        val cum = ev.groupBy(cents.as("v")).agg(count(lit(1)).as("cnt"))
          .select(col("v"),
            sum(col("cnt")).over(w.rowsBetween(Long.MinValue, 0)).as("cum"),
            sum(col("cnt")).over(
              org.apache.spark.sql.expressions.Window.partitionBy())
              .as("total"))
          .select(col("v"), col("cum"), col("total"),
            explode(lit(Array(50L, 90L, 99L))).as("q_centi"))
        def needed(qShift: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          greatest(lit(1L), least(col("total"),
            floor(col("total") * qShift / lit(100L)).cast("long")))
        val lo = cum.filter(col("cum") >= needed(col("q_centi") - 5))
          .groupBy(col("q_centi")).agg(min(col("v")).as("lo"))
        val hi = cum.filter(col("cum") >= needed(col("q_centi") + 5))
          .groupBy(col("q_centi")).agg(min(col("v")).as("hi"))
        est.join(lo, "q_centi").join(hi, "q_centi")
          .select(col("q_centi"), col("n_sample"), col("est"),
            col("lo"), col("hi"),
            (col("est") >= col("lo") && col("est") <= col("hi")).as("ok"))
      },
      Some("""WITH s AS (SELECT * FROM (
                     SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                              1, 8))::BIGINT AS h,
                            CAST(CAST(value AS DECIMAL(18,2)) * 100
                              AS BIGINT) AS v
                     FROM events) ORDER BY h, v LIMIT 4096),
             r AS (SELECT v, row_number() OVER (ORDER BY v, h) AS rn,
                          count(*) OVER () AS n
                   FROM s),
             q AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS q_centi),
             e AS (SELECT q.q_centi, CAST(r.n AS BIGINT) AS n_sample, r.v AS est
                   FROM r, q
                   WHERE r.rn = ((r.n - 1) * q.q_centi) // 100 + 1),
             c AS (SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                     AS v, CAST(count(*) AS BIGINT) AS cnt
                   FROM events GROUP BY 1),
             cc AS (SELECT v,
                      sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                        AS cum,
                      sum(cnt) OVER () AS total
                    FROM c),
             jq AS (SELECT cc.*, q.q_centi FROM cc, q),
             lo AS (SELECT q_centi, min(v) AS lo FROM jq
                    WHERE cum >= greatest(1, least(total,
                      (total * (q_centi - 5)) // 100)) GROUP BY 1),
             hi AS (SELECT q_centi, min(v) AS hi FROM jq
                    WHERE cum >= greatest(1, least(total,
                      (total * (q_centi + 5)) // 100)) GROUP BY 1)
             SELECT e.q_centi, e.n_sample, e.est, lo.lo, hi.hi,
                    e.est >= lo.lo AND e.est <= hi.hi AS ok
             FROM e JOIN lo USING (q_centi) JOIN hi USING (q_centi)""")
    ),

    // Grouped KMV: per-event-type quantiles over the unbounded cents
    // domain — per-group bottom-1000 via row_number<=k (WindowGroupLimit:
    // k rows per group map-side, never a whole-group buffer), floor-rank
    // pick per group. ONE shuffle on the group key; memory k·|groups|
    // for any domain.
    GraftQuery(
      "x_sketch_quantile_grouped",
      (s, dir) =>
        graft.sketch.Sketches.kmvGroupedQuantiles(Tables.events(s, dir),
          col("event_type"), col("event_id"),
          graft.obs.Observability.cents(col("value"))),
      Some("""WITH hv AS (SELECT event_type AS g,
                     ('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                        1, 8))::BIGINT AS h,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
                   FROM events),
             sk AS (SELECT g, h, v FROM (
                      SELECT g, h, v, row_number() OVER (
                        PARTITION BY g ORDER BY h, v) AS rnh
                      FROM hv) WHERE rnh <= 1000),
             r AS (SELECT g, v,
                     row_number() OVER (PARTITION BY g ORDER BY v, h) AS rn,
                     count(*) OVER (PARTITION BY g) AS n
                   FROM sk),
             q AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS q_centi)
             SELECT r.g, q.q_centi, CAST(r.n AS BIGINT) AS n_sample,
                    r.v AS est
             FROM r, q
             WHERE r.rn = ((r.n - 1) * q.q_centi) // 100 + 1""")
    ),

    // Production half: the sample-path estimates alone (one TakeOrdered
    // pass + a ≤k-row rank pick, no exact comparator) — the shape a
    // 100 TB unbounded-domain quantile actually runs. Yardstick twin of
    // x_sketch_quantile_kmv, as x_sketch_hll_build is for x_sketch_hll.
    GraftQuery(
      "x_sketch_quantile_kmv_sample",
      (s, dir) =>
        graft.sketch.Sketches.kmvQuantiles(Tables.events(s, dir),
          col("event_id"), graft.obs.Observability.cents(col("value"))),
      Some("""WITH s AS (SELECT * FROM (
                     SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                              1, 8))::BIGINT AS h,
                            CAST(CAST(value AS DECIMAL(18,2)) * 100
                              AS BIGINT) AS v
                     FROM events) ORDER BY h, v LIMIT 4096),
             r AS (SELECT v, row_number() OVER (ORDER BY v, h) AS rn,
                          count(*) OVER () AS n
                   FROM s),
             q AS (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS q_centi)
             SELECT q.q_centi, CAST(r.n AS BIGINT) AS n_sample, r.v AS est
             FROM r, q
             WHERE r.rn = ((r.n - 1) * q.q_centi) // 100 + 1""")
    )
  )
}
