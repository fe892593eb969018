package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.obs.Observability
import graft.text.TextAnalysis

/** Corpus-curation / governance gates, batch 3 (round 12): PMI
  * collocations, l-diversity audit, file-stats scan pruning. Common
  * thread: every score and flag is exact integer arithmetic (cross-
  * multiplied thresholds, DECIMAL(38,0) intermediates where corpus-scale
  * products overflow BIGINT, ppm-scaled monotone transforms instead of
  * logs), so the DuckDB oracle replays each result bit-for-bit.
  */
object CurateQueries2 {

  def all: Seq[GraftQuery] = Seq(

    // PMI collocations: top-50 bigrams by pointwise mutual information,
    // support >= 5. Score = (1e6·c_xy·N) div (c_x·c_y) — the PMI
    // argument in ppm (log is monotone ⇒ same ranking), exact integers
    // only. Token identity is the 60-bit md5 prefix (both engines draw
    // identical hashes), so the counting aggregates shuffle longs and
    // only the ≤100 winner word hashes resolve back to text; ties at
    // the k-cutoff order by (pmi desc, h1, h2) in BOTH engines.
    GraftQuery(
      "x_text_pmi",
      (s, dir) =>
        TextAnalysis.pmiCollocations(Tables.documents(s, dir), col("text")),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS l
                         FROM documents),
             ix AS (SELECT doc_id, l, unnest(range(0, len(l))) AS i FROM d),
             t AS (SELECT doc_id, i, l[i+1] AS w,
                          ('0x' || substr(md5(l[i+1]), 1, 15))::BIGINT AS h
                   FROM ix),
             b0 AS (SELECT doc_id, i, h AS h1,
                           lead(h) OVER (PARTITION BY doc_id ORDER BY i)
                             AS h2
                    FROM t),
             bi AS (SELECT h1, h2, CAST(count(*) AS BIGINT) AS c_xy
                    FROM b0 WHERE h2 IS NOT NULL GROUP BY 1, 2),
             uni AS (SELECT h, CAST(count(*) AS BIGINT) AS c_w
                     FROM t GROUP BY 1),
             n AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n_bi FROM bi),
             top AS (SELECT bi.h1, bi.h2, bi.c_xy, u1.c_w AS c_x,
                            u2.c_w AS c_y,
                            CAST((1000000::HUGEINT * bi.c_xy * n.n_bi)
                              // (u1.c_w::HUGEINT * u2.c_w) AS BIGINT)
                              AS pmi_ppm
                     FROM bi
                     JOIN uni u1 ON bi.h1 = u1.h
                     JOIN uni u2 ON bi.h2 = u2.h
                     CROSS JOIN n
                     WHERE bi.c_xy >= 5
                     ORDER BY pmi_ppm DESC, h1, h2 LIMIT 50),
             wmin AS (SELECT h, min(w) AS w FROM t GROUP BY 1)
             SELECT w1.w || ' ' || w2.w AS bigram, top.c_xy, top.c_x,
                    top.c_y, top.pmi_ppm
             FROM top
             JOIN wmin w1 ON top.h1 = w1.h
             JOIN wmin w2 ON top.h2 = w2.h""")
    ),

    // l-diversity audit (Machanavajjhala et al. 2006), the companion to
    // x_kanonymity: a QI class that is k-anonymous but serves ONE
    // sensitive value still discloses it. Class = (nation, $1000
    // balance band); sensitive = market segment. Flags: l_ok (>= 3
    // distinct segments) and homog_risk (top segment > 80% of the
    // class, cross-multiplied — max_cnt·5 > n_rows·4). The +100000
    // cents shift keeps the band dividend non-negative: Spark's `div`
    // truncates toward zero while DuckDB's `//` floors, so negative
    // balances would band differently without it. One two-level
    // aggregate; output is |classes| rows at any input size.
    GraftQuery(
      "x_ldiversity",
      (s, dir) =>
        Tables.customer(s, dir)
          .select(col("c_nationkey").cast("long").as("nation"),
            expr("(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)" +
              " + 100000) div 100000").as("band"),
            col("c_mktsegment").as("seg"))
          .groupBy(col("nation"), col("band"), col("seg"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("nation"), col("band"))
          .agg(sum(col("c")).as("n_rows"),
            count(lit(1)).as("n_seg"),
            max(col("c")).as("max_cnt"))
          .withColumn("l_ok",
            when(col("n_seg") >= 3L, lit(1L)).otherwise(lit(0L)))
          .withColumn("homog_risk",
            when(col("max_cnt") * 5 > col("n_rows") * 4, lit(1L))
              .otherwise(lit(0L))),
      Some("""WITH s AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
                     (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                       + 100000) // 100000 AS band,
                     c_mktsegment AS seg
                   FROM customer),
             g AS (SELECT nation, band, seg, CAST(count(*) AS BIGINT) AS c
                   FROM s GROUP BY 1, 2, 3)
             SELECT nation, band,
                    CAST(sum(c) AS BIGINT) AS n_rows,
                    CAST(count(*) AS BIGINT) AS n_seg,
                    CAST(max(c) AS BIGINT) AS max_cnt,
                    CAST(CASE WHEN count(*) >= 3 THEN 1 ELSE 0 END
                      AS BIGINT) AS l_ok,
                    CAST(CASE WHEN max(c) * 5 > sum(c) * 4 THEN 1 ELSE 0 END
                      AS BIGINT) AS homog_risk
             FROM g GROUP BY 1, 2""")
    ),

    // Flesch-Kincaid readability in exact centi-grades (+10000 offset
    // keeps the integer division identical under Spark's truncate-div
    // and DuckDB's floor-div). Map-only — three regexp counts in one
    // projection.
    GraftQuery(
      "x_text_readability",
      (s, dir) =>
        TextAnalysis.readability(Tables.documents(s, dir), col("doc_id"),
          col("text")),
      Some("""SELECT doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
                    greatest(CAST(len(regexp_extract_all(text, '[.!?]'))
                      AS BIGINT), 1) AS sentences,
                    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                      AS BIGINT) AS syllables,
                    (39 * words * words + 1180 * syllables * sentences
                      + 8441 * sentences * words) // (sentences * words)
                      AS fk_centi_p10k,
                    CASE WHEN fk_centi_p10k < 10800 THEN 'easy'
                         WHEN fk_centi_p10k < 11300 THEN 'standard'
                         ELSE 'hard' END AS band
             FROM (SELECT doc_id, text FROM documents)""")
    ),

    // CIDR longest-prefix enrichment (the geoip2 lookup's real form):
    // a 344-rule table over three prefix lengths, every fact row
    // resolved to its most specific block by ONE codegen'd binary-
    // search lookup (per-plen sorted nets, longest first — the router
    // LPM technique) carried as a plan reference object: zero joins,
    // zero shuffles, zero row expansion; the oracle replays the
    // equivalent chained-left-join form. IPs derive from md5(event_id)
    // (both engines draw identical addresses); the rule table is
    // generated from the same integer recurrences in both engines.
    GraftQuery(
      "x_enrich_cidr",
      (s, dir) => {
        import org.apache.spark.sql.graftshim.shim
        val rules = (0 until 24).map(r =>
            (((r * 11L) % 256) << 24, 8L, s"net8_$r")) ++
          (0 until 64).map(r =>
            (((r * 1031L) % 65536) << 16, 16L, s"net16_$r")) ++
          (0 until 256).map(r =>
            (((r * 7919L) % 16777216) << 8, 24L, s"net24_$r"))
        import s.implicits._
        val ruleDf = rules.toDF("net", "plen", "label")
        val ip = shiftrightunsigned(shim.column(
          graft.functions.Md5First64(shim.expression(col("event_id")))), 32)
        graft.ops.Enrich.cidrLookup(
            Tables.events(s, dir).select(col("event_id")), ip, ruleDf)
          .groupBy(col("matched_plen"), col("label"))
          .agg(count(lit(1)).as("n_rows"))
      },
      Some("""WITH ips AS (SELECT ('0x' || substr(md5(CAST(event_id
                       AS VARCHAR)), 1, 8))::BIGINT AS ip
                   FROM events),
             rules AS (SELECT CAST((r*11) % 256 AS BIGINT) << 24 AS net,
                         CAST(8 AS BIGINT) AS plen,
                         'net8_' || CAST(r AS VARCHAR) AS label
                       FROM (SELECT unnest(range(24)) AS r)
                       UNION ALL
                       SELECT CAST((r*1031) % 65536 AS BIGINT) << 16,
                         16, 'net16_' || CAST(r AS VARCHAR)
                       FROM (SELECT unnest(range(64)) AS r)
                       UNION ALL
                       SELECT CAST((r*7919) % 16777216 AS BIGINT) << 8,
                         24, 'net24_' || CAST(r AS VARCHAR)
                       FROM (SELECT unnest(range(256)) AS r)),
             j AS (SELECT i.ip, r24.label AS l24, r16.label AS l16,
                          r8.label AS l8
                   FROM ips i
                   LEFT JOIN (SELECT * FROM rules WHERE plen = 24) r24
                     ON (i.ip & 4294967040) = r24.net
                   LEFT JOIN (SELECT * FROM rules WHERE plen = 16) r16
                     ON (i.ip & 4294901760) = r16.net
                   LEFT JOIN (SELECT * FROM rules WHERE plen = 8) r8
                     ON (i.ip & 4278190080) = r8.net)
             SELECT CAST(CASE WHEN l24 IS NOT NULL THEN 24
                              WHEN l16 IS NOT NULL THEN 16
                              WHEN l8 IS NOT NULL THEN 8 END AS BIGINT)
                      AS matched_plen,
                    coalesce(l24, l16, l8) AS label,
                    CAST(count(*) AS BIGINT) AS n_rows
             FROM j GROUP BY 1, 2""")
    ),

    // IPv6 longest-prefix enrichment: 128-bit addresses as two BIGINTs
    // (hi = 31 md5 bits * 2^32 + 32 md5 bits, so bit 63 is always 0 and
    // no engine-specific shift-overflow semantics are in play; lo from
    // an independent second digest). Three prefix lengths cross the
    // interesting mask cases: /9 (hi-only mask, synthetic rules), /68
    // (full hi + 4 lo bits, rules drawn from a capped 1/11 sample of
    // the data itself), /128 (exact address, capped 1/23 sample) — LPM
    // picks the deepest. Same shape as IPv4: one codegen'd two-long binary-search
    // lookup per row, fact side map-only, zero joins, zero expansion.
    GraftQuery(
      "x_enrich_cidr6",
      (s, dir) => {
        import org.apache.spark.sql.graftshim.shim
        import s.implicits._
        def h64(c: org.apache.spark.sql.Column) =
          shim.column(graft.functions.Md5First64(shim.expression(c)))
        def twoLong(c: org.apache.spark.sql.Column) = {
          val a = shiftrightunsigned(h64(c), 32)
          val b = h64(c).bitwiseAND(lit(0xFFFFFFFFL))
          (a % 2147483648L) * 4294967296L + b
        }
        val withIp = Tables.events(s, dir).select(col("event_id"))
          .withColumn("ip_hi", twoLong(col("event_id")))
          .withColumn("ip_lo", twoLong(col("event_id") * 2 + 1))
        // rule table = driver model state (a CIDR db is a STATIC
        // dimension): ONE sampled scan derives both data-drawn rule
        // sets, so the probe pass is the only full scan in the plan.
        // The sample is CAPPED to the low id range (< 1e6 — replica-0
        // ids at every scale-up) so the rule table is a FIXED ~13.5k
        // rules (9.1k /68 + 4.3k /128 + 24 /9) at sf1/sf10/sf100 —
        // r14's uncapped 1/257 derivation grew the dimension WITH the
        // fact table, confounding the decade trend (VERDICT r14 #2:
        // a real CIDR db does not grow with traffic volume)
        val sampled = withIp
          .filter((col("event_id") % 11 === 0 ||
              col("event_id") % 23 === 0) && col("event_id") < 1000000)
          .collect()
        val r68 = sampled.filter(_.getLong(0) % 11 == 0)
          .map(r => (r.getLong(1), r.getLong(2) & (-1L << 60), 68L, "net68"))
          .distinct.toSeq
        val r128 = sampled.filter(_.getLong(0) % 23 == 0)
          .map(r => (r.getLong(1), r.getLong(2), 128L, "net128"))
          .distinct.toSeq
        val r9 = (0 until 24).map(r =>
          (((r * 11L) % 256) << 55, 0L, 9L, s"net9_$r"))
        val rules = (r9 ++ r68 ++ r128)
          .toDF("net_hi", "net_lo", "plen", "label")
        graft.ops.Enrich.cidrLookup6(withIp, col("ip_hi"), col("ip_lo"),
            rules)
          .groupBy(col("matched_plen"), col("label"))
          .agg(count(lit(1)).as("n_rows"))
      },
      Some("""WITH ips AS (SELECT event_id,
                     ((('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                        1, 8))::BIGINT % 2147483648) * 4294967296
                      + ('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                         9, 8))::BIGINT) AS ip_hi,
                     ((('0x' || substr(md5(CAST(event_id*2+1 AS VARCHAR)),
                        1, 8))::BIGINT % 2147483648) * 4294967296
                      + ('0x' || substr(md5(CAST(event_id*2+1 AS VARCHAR)),
                         9, 8))::BIGINT) AS ip_lo
                   FROM events),
             r9 AS (SELECT CAST((r*11) % 256 AS BIGINT) << 55 AS net_hi,
                           'net9_' || CAST(r AS VARCHAR) AS label
                    FROM (SELECT unnest(range(24)) AS r)),
             r68 AS (SELECT DISTINCT ip_hi AS net_hi,
                            ip_lo & -1152921504606846976 AS net_lo
                     FROM ips WHERE event_id % 11 = 0
                       AND event_id < 1000000),
             r128 AS (SELECT DISTINCT ip_hi AS net_hi, ip_lo AS net_lo
                      FROM ips WHERE event_id % 23 = 0
                        AND event_id < 1000000),
             j AS (SELECT i.ip_hi,
                          (r128.net_hi IS NOT NULL) AS m128,
                          (r68.net_hi IS NOT NULL) AS m68,
                          r9.label AS l9
                   FROM ips i
                   LEFT JOIN r128 ON i.ip_hi = r128.net_hi
                     AND i.ip_lo = r128.net_lo
                   LEFT JOIN r68 ON i.ip_hi = r68.net_hi
                     AND (i.ip_lo & -1152921504606846976) = r68.net_lo
                   LEFT JOIN r9 ON (i.ip_hi & -36028797018963968) = r9.net_hi)
             SELECT CAST(CASE WHEN m128 THEN 128
                              WHEN m68 THEN 68
                              WHEN l9 IS NOT NULL THEN 9 END AS BIGINT)
                      AS matched_plen,
                    CASE WHEN m128 THEN 'net128'
                         WHEN m68 THEN 'net68'
                         ELSE l9 END AS label,
                    CAST(count(*) AS BIGINT) AS n_rows
             FROM j GROUP BY 1, 2""")
    ),

    // Z-order × stats pruning, quantified: the same events laid out
    // time-sorted (fid = 256-minute file) vs z-ordered (fid = top-8
    // z-curve bits = a (tb_hi4, cb_hi4) rectangle), pruned by a 2-dim
    // predicate (middle-half time range ∧ cents < $20) using per-file
    // (min,max) stats on BOTH dims. The time layout prunes only the
    // time dim (~50% of rows scanned); the z-order cells are tight
    // rectangles in BOTH dims, so the value band prunes too (~3%) —
    // the measured version of the r9 `x_layout_zorder` cell-bounds
    // invariant, and the reason z-ordering exists. Stats build is one
    // |files|-row aggregate; pruning reads stats only.
    GraftQuery(
      "x_layout_zorder_prune",
      (s, dir) => {
        val terms = (0 until 16).map { i =>
          s"(((tb >> $i) & 1) << ${2 * i}) + (((cb >> $i) & 1) << ${2 * i + 1})"
        }.mkString(" + ")
        val tLo = 16384L; val tHi = 32768L; val cHi = 2000L
        Tables.events(s, dir)
          .withColumn("cents", Observability.cents(col("value")))
          .select(expr("(ts_ns div 1000 div 60000000) % 65536").as("tb"),
            least(col("cents"), lit(65535L)).as("cb"))
          .withColumn("z", expr(terms))
          .select(explode(array(
            struct(lit("time").as("layout"),
              expr("tb div 256").as("fid")),
            struct(lit("zorder").as("layout"),
              expr("z div 16777216").as("fid")))).as("lf"),
            col("tb"), col("cb"))
          .select(col("lf.layout").as("layout"), col("lf.fid").as("fid"),
            col("tb"), col("cb"))
          .groupBy(col("layout"), col("fid"))
          .agg(count(lit(1)).as("n"),
            min(col("tb")).as("tb_min"), max(col("tb")).as("tb_max"),
            min(col("cb")).as("cb_min"), max(col("cb")).as("cb_max"))
          .withColumn("read",
            col("tb_max") >= tLo && col("tb_min") < tHi &&
              col("cb_min") < cHi)
          .groupBy(col("layout"))
          .agg(count(lit(1)).as("n_files"),
            sum(when(col("read"), 1L).otherwise(0L)).as("files_read"),
            sum(col("n")).as("rows_total"),
            sum(when(col("read"), col("n")).otherwise(0L))
              .as("rows_scanned"))
          .withColumn("scan_ppm",
            expr("(1000000 * rows_scanned) div rows_total"))
      },
      Some {
        val terms = (0 until 16).map { i =>
          s"(((tb >> $i) & 1) << ${2 * i}) + (((cb >> $i) & 1) << ${2 * i + 1})"
        }.mkString(" + ")
        s"""WITH s AS (SELECT (epoch_ns(ts) // 1000 // 60000000) % 65536
                       AS tb,
                     least(CAST(CAST(value AS DECIMAL(18,2)) * 100
                       AS BIGINT), 65535) AS cb
                   FROM events),
             z AS (SELECT tb, cb, $terms AS z FROM s),
             lf AS (SELECT 'time' AS layout, tb // 256 AS fid, tb, cb
                    FROM z
                    UNION ALL
                    SELECT 'zorder', z // 16777216, tb, cb FROM z),
             st AS (SELECT layout, fid, CAST(count(*) AS BIGINT) AS n,
                           min(tb) AS tb_min, max(tb) AS tb_max,
                           min(cb) AS cb_min, max(cb) AS cb_max
                    FROM lf GROUP BY 1, 2),
             pr AS (SELECT layout, n,
                           (tb_max >= 16384 AND tb_min < 32768 AND
                            cb_min < 2000) AS read
                    FROM st)
             SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
                    CAST(sum(CASE WHEN read THEN 1 ELSE 0 END) AS BIGINT)
                      AS files_read,
                    CAST(sum(n) AS BIGINT) AS rows_total,
                    CAST(sum(CASE WHEN read THEN n ELSE 0 END) AS BIGINT)
                      AS rows_scanned,
                    (1000000 * CAST(sum(CASE WHEN read THEN n ELSE 0 END)
                       AS BIGINT)) // CAST(sum(n) AS BIGINT) AS scan_ppm
             FROM pr GROUP BY 1"""
      }
    ),

    // File-stats scan pruning: the data-skipping arithmetic behind
    // every lakehouse planner — per-file (min_ts, max_ts, n) stats
    // decide which files a 6-hour predicate window must read, WITHOUT
    // touching data. Two layouts of the same events: time-clustered
    // (fid = 6h bucket — stats ranges are tight, ~1/120 of files read)
    // vs hash-clustered (fid = user_id % 64 — every file straddles the
    // window, nothing prunes). scan_ppm is the read fraction in exact
    // ppm; at 100 TB this ratio IS the query's cost. The stats build is
    // one |files|-row aggregate; the pruning decision reads stats only.
    GraftQuery(
      "x_layout_stats_prune",
      (s, dir) => {
        val lo = 1705363200000000000L // 2024-01-16 00:00 UTC
        val hi = lo + 21600000000000L // + 6 h
        Tables.events(s, dir)
          .select(explode(array(
            struct(lit("time").as("layout"),
              expr("ts_ns div 21600000000000").as("fid")),
            struct(lit("hash").as("layout"),
              (col("user_id") % 64).as("fid")))).as("lf"),
            col("ts_ns"))
          .select(col("lf.layout").as("layout"), col("lf.fid").as("fid"),
            col("ts_ns"))
          .groupBy(col("layout"), col("fid"))
          .agg(count(lit(1)).as("n"),
            min(col("ts_ns")).as("min_ts"), max(col("ts_ns")).as("max_ts"))
          .withColumn("read",
            col("max_ts") >= lo && col("min_ts") < hi)
          .groupBy(col("layout"))
          .agg(count(lit(1)).as("n_files"),
            sum(when(col("read"), 1L).otherwise(0L)).as("files_read"),
            sum(col("n")).as("rows_total"),
            sum(when(col("read"), col("n")).otherwise(0L))
              .as("rows_scanned"))
          .withColumn("scan_ppm",
            expr("(1000000 * rows_scanned) div rows_total"))
      },
      Some("""WITH e AS (SELECT epoch_ns(ts) AS ts_ns, user_id
                         FROM events),
             lf AS (SELECT 'time' AS layout,
                           ts_ns // 21600000000000 AS fid, ts_ns
                    FROM e
                    UNION ALL
                    SELECT 'hash' AS layout, user_id % 64 AS fid, ts_ns
                    FROM e),
             st AS (SELECT layout, fid, CAST(count(*) AS BIGINT) AS n,
                           min(ts_ns) AS min_ts, max(ts_ns) AS max_ts
                    FROM lf GROUP BY 1, 2),
             pr AS (SELECT layout, n,
                           (max_ts >= 1705363200000000000 AND
                            min_ts < 1705384800000000000) AS read
                    FROM st)
             SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
                    CAST(sum(CASE WHEN read THEN 1 ELSE 0 END) AS BIGINT)
                      AS files_read,
                    CAST(sum(n) AS BIGINT) AS rows_total,
                    CAST(sum(CASE WHEN read THEN n ELSE 0 END) AS BIGINT)
                      AS rows_scanned,
                    (1000000 * CAST(sum(CASE WHEN read THEN n ELSE 0 END)
                       AS BIGINT)) // CAST(sum(n) AS BIGINT) AS scan_ppm
             FROM pr GROUP BY 1""")
    ),

    // t-closeness audit (Li, Li & Venkatasubramanian 2007), completing
    // the k-anonymity / l-diversity trio: an l-diverse class whose
    // sensitive-value DISTRIBUTION still skews far from the table-wide
    // one leaks attribute information. QI class = (order year,
    // priority); sensitive attribute = the $50k price band (m = 10
    // ordered bins). Closeness = ordered-EMD, Σ_{i<m-1} |cumP_i −
    // cumQ_i| / (m−1) — kept integer-exact as emd_num = Σ |C_i·N −
    // G_i·n| (units 1/(n·N)); the t = 0.2 verdict cross-multiplies:
    // 5·emd_num > 9·n·N. Scale shape: ONE count aggregate over ONE
    // corpus scan — the audit-sized class-count table collects as model
    // state and the grid fill, cumulative sums, global distribution,
    // and N all derive from it locally. emd_num peaks at (m−1)·n·N — BIGINT
    // holds to ~10^9 rows per class; past that lift to DECIMAL(38,0)
    // like the mixing gates.
    GraftQuery(
      "x_tcloseness",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val o = Tables.orders(s, dir).select(
          year(col("o_orderdate")).cast("long").as("yr"),
          col("o_orderpriority").as("prio"),
          expr("least(9, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100" +
            " AS BIGINT) div 5000000)").as("band"))
        // ONE corpus scan: the class-count table is audit-sized
        // (|classes|×10 rows) and every downstream step — grid fill,
        // cumulative sums, global distribution, N — derives from it, so
        // it collects once as model state (the CIDR-rules pattern); the
        // lazy plan would otherwise re-scan the corpus per reference
        val cc = s.createDataFrame(
          java.util.Arrays.asList(
            o.groupBy(col("yr"), col("prio"), col("band"))
              .agg(count(lit(1)).as("c")).collect(): _*),
          new org.apache.spark.sql.types.StructType()
            .add("yr", "long").add("prio", "string")
            .add("band", "long").add("c", "long"))
        val bands = s.range(0, 10).select(col("id").as("band"))
        val grid = cc.select(col("yr"), col("prio")).distinct()
          .crossJoin(broadcast(bands))
        val filled = grid.join(cc, Seq("yr", "prio", "band"), "left")
          .select(col("yr"), col("prio"), col("band"),
            coalesce(col("c"), lit(0L)).as("c"))
        val wCum = Window.partitionBy(col("yr"), col("prio"))
          .orderBy(col("band"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(col("yr"), col("prio"))
        val cum = filled
          .withColumn("cum_c", sum(col("c")).over(wCum))
          .withColumn("n_rows", sum(col("c")).over(wAll))
        // global distribution and N derive from the class counts (Σ by
        // band / Σ overall) — the corpus is scanned exactly ONCE
        val gc = broadcast(bands)
          .join(cc.groupBy(col("band")).agg(sum(col("c")).as("g")),
            Seq("band"), "left")
          .select(col("band"), coalesce(col("g"), lit(0L)).as("g"))
        val wG = Window.orderBy(col("band"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val gCum = gc.withColumn("cum_g", sum(col("g")).over(wG))
        val nTot = cc.agg(sum(col("c")).as("n_total"))
        cum.join(broadcast(gCum.select(col("band"), col("cum_g"))),
            Seq("band"))
          .crossJoin(broadcast(nTot))
          .filter(col("band") < 9)
          .groupBy(col("yr"), col("prio"))
          .agg(max(col("n_rows")).as("n_rows"),
            sum(abs(col("cum_c") * col("n_total") -
              col("cum_g") * col("n_rows"))).as("emd_num"),
            max(col("n_total")).as("nt"))
          .withColumn("t_fail",
            when(col("emd_num") * 5 > lit(9L) * col("n_rows") * col("nt"),
              lit(1L)).otherwise(lit(0L)))
          .drop("nt")
      },
      Some("""WITH o AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
                     o_orderpriority AS prio,
                     least(9, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) // 5000000) AS band
                   FROM orders),
             cc AS (SELECT yr, prio, band, CAST(count(*) AS BIGINT) AS c
                    FROM o GROUP BY 1, 2, 3),
             bands AS (SELECT unnest(range(0, 10)) AS band),
             grid AS (SELECT yr, prio, band
                      FROM (SELECT DISTINCT yr, prio FROM cc), bands),
             filled AS (SELECT g.yr, g.prio, g.band,
                          coalesce(cc.c, 0) AS c
                        FROM grid g LEFT JOIN cc ON cc.yr = g.yr
                          AND cc.prio = g.prio AND cc.band = g.band),
             cum AS (SELECT yr, prio, band,
                       CAST(sum(c) OVER (PARTITION BY yr, prio
                         ORDER BY band) AS BIGINT) AS cum_c,
                       CAST(sum(c) OVER (PARTITION BY yr, prio)
                         AS BIGINT) AS n_rows
                     FROM filled),
             gb AS (SELECT band, CAST(count(*) AS BIGINT) AS g
                    FROM o GROUP BY 1),
             gfill AS (SELECT b.band, coalesce(gb.g, 0) AS g
                       FROM bands b LEFT JOIN gb ON gb.band = b.band),
             gcum AS (SELECT band, CAST(sum(g) OVER (ORDER BY band)
                        AS BIGINT) AS cum_g FROM gfill),
             n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM o)
             SELECT c2.yr, c2.prio,
                    CAST(max(c2.n_rows) AS BIGINT) AS n_rows,
                    CAST(sum(abs(c2.cum_c * n.n_total -
                      g.cum_g * c2.n_rows)) AS BIGINT) AS emd_num,
                    CAST(CASE WHEN sum(abs(c2.cum_c * n.n_total -
                        g.cum_g * c2.n_rows)) * 5 >
                        9 * max(c2.n_rows) * max(n.n_total)
                      THEN 1 ELSE 0 END AS BIGINT) AS t_fail
             FROM cum c2 JOIN gcum g USING (band) CROSS JOIN n
             WHERE c2.band < 9
             GROUP BY 1, 2""")
    )
  )
}
