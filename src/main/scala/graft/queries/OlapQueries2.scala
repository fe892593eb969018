package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.obs.Observability.cents

/** Second warehouse-surface batch: skyline (Pareto front), Deequ-style
  * constraint validation, and snapshot reconciliation (table diff) —
  * the data-quality and multi-criteria cuts a lakehouse team runs over
  * the same tables the log pipeline lands.
  */
object OlapQueries2 {

  /** One-time JVM-exit cleanup for the session-scoped schema-merge
    * scratch dir: per-session naming fixed the concurrent-clobber bug
    * but would otherwise leak two parquet snapshots per session in
    * java.io.tmpdir forever. Registered once per path (the gate runs
    * many times per bench session).
    */
  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def registerScratchCleanup(path: String): Unit =
    if (cleanupRegistered.add(path)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles()
          if (kids != null) kids.foreach(rm)
          f.delete(): Unit
        }
        rm(new java.io.File(path))
      }))
    }

  def all: Seq[GraftQuery] = Seq(

    // Skyline / Pareto front: the parts no other part beats on BOTH
    // (cheaper, bigger). Spark side is the two-phase distributed
    // skyline (partition-local streaming dominance scan, then the same
    // kernel once over the tiny survivor union — ops/Skyline.scala);
    // the oracle is the O(n²) NOT EXISTS form the operator avoids.
    GraftQuery(
      "x_olap_skyline",
      (s, dir) => {
        val p = Tables.part(s, dir).select(col("p_partkey"),
          cents(col("p_retailprice")).as("price_cents"),
          col("p_size").cast("long").as("psize"))
        graft.ops.Skyline.skyline2d(p, "price_cents", "psize")
      },
      Some("""WITH p AS (SELECT p_partkey,
                     CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS price_cents,
                     CAST(p_size AS BIGINT) AS psize FROM part)
             SELECT p_partkey, price_cents, psize FROM p a
             WHERE NOT EXISTS (SELECT 1 FROM p b
               WHERE b.price_cents <= a.price_cents AND b.psize >= a.psize
                 AND (b.price_cents < a.price_cents OR b.psize > a.psize))""")
    ),

    // Data-quality constraint suite (Deequ-shaped `check` rather than
    // the x_profile_table profiler): not-null, primary-key uniqueness,
    // range, accepted-set, and referential-integrity verdicts over a
    // deterministically-dirtied orders snapshot (NULL/orphan custkeys,
    // negated prices, bogus statuses, duplicated keys — so every
    // counter is exercised non-zero). Scale shape: the four row-local
    // checks ride ONE aggregate over one scan; the FK check is the one
    // unavoidable shuffle (anti-join against the dimension's keys) and
    // at 100 TB it's exactly the bloom-prunable semi-join family
    // (x_join_bloom_probe) — everything else never shuffles a row.
    GraftQuery(
      "x_dq_constraints",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val mut = o.select(col("o_orderkey"),
          when(col("o_orderkey") % 977 === 0, lit(null).cast("long"))
            .when(col("o_orderkey") % 997 === 0, lit(-1L))
            .otherwise(col("o_custkey")).as("cust"),
          when(col("o_orderkey") % 991 === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("status"),
          when(col("o_orderkey") % 983 === 0, -col("o_totalprice"))
            .otherwise(col("o_totalprice")).as("price"))
        val dirty = mut.unionAll(mut.filter(col("o_orderkey") % 1009 === 0))
        // row-local checks in ONE Expand-free aggregate (a countDistinct
        // here would Expand every row ×2); uniqueness instead folds
        // through a key-grouped count with map-side partials —
        // Σcnt − |keys| ≡ n − distinct
        val agg = dirty.agg(
          count(lit(1)).as("n"),
          sum(col("cust").isNull.cast("long")).as("v_null"),
          sum((col("price") <= 0).cast("long")).as("v_range"),
          sum((!col("status").isin("O", "F", "P")).cast("long")).as("v_set"))
        val dup = dirty.groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("cnt"))
          .agg((sum(col("cnt")) - count(lit(1))).as("v_dup"))
        val fk = dirty.filter(col("cust").isNotNull)
          .join(Tables.customer(s, dir).select(col("c_custkey")),
            col("cust") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("v_fk"))
        agg.crossJoin(broadcast(dup)).crossJoin(broadcast(fk))
          .select(expr("stack(5, " +
            "'not_null:o_custkey', v_null, " +
            "'unique:o_orderkey', v_dup, " +
            "'range:o_totalprice_gt0', v_range, " +
            "'accepted:o_orderstatus', v_set, " +
            "'fk:o_custkey_customer', v_fk) AS (cname, violations)"),
            col("n").as("checked"))
          .withColumn("pass", col("violations") === 0L)
      },
      Some("""WITH mut AS (SELECT o_orderkey,
                     CASE WHEN o_orderkey % 977 = 0 THEN NULL
                          WHEN o_orderkey % 997 = 0 THEN -1
                          ELSE o_custkey END AS cust,
                     CASE WHEN o_orderkey % 991 = 0 THEN 'X'
                          ELSE o_orderstatus END AS status,
                     CASE WHEN o_orderkey % 983 = 0 THEN -o_totalprice
                          ELSE o_totalprice END AS price
                   FROM orders),
             dirty AS (SELECT * FROM mut
               UNION ALL SELECT * FROM mut WHERE o_orderkey % 1009 = 0),
             a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN cust IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS v_null,
                     CAST(count(*) - count(DISTINCT o_orderkey)
                       AS BIGINT) AS v_dup,
                     CAST(sum(CASE WHEN price <= 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS v_range,
                     CAST(sum(CASE WHEN status NOT IN ('O','F','P')
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_set
                   FROM dirty),
             fk AS (SELECT CAST(count(*) AS BIGINT) AS v_fk FROM dirty d
                    WHERE d.cust IS NOT NULL AND NOT EXISTS
                      (SELECT 1 FROM customer c WHERE c.c_custkey = d.cust)),
             st AS (SELECT 'not_null:o_custkey' AS cname,
                      v_null AS violations, n FROM a
               UNION ALL SELECT 'unique:o_orderkey', v_dup, n FROM a
               UNION ALL SELECT 'range:o_totalprice_gt0', v_range, n FROM a
               UNION ALL SELECT 'accepted:o_orderstatus', v_set, n FROM a
               UNION ALL SELECT 'fk:o_custkey_customer',
                      (SELECT v_fk FROM fk), n FROM a)
             SELECT cname, violations, n AS checked,
                    violations = 0 AS pass FROM st""")
    ),

    // Snapshot reconciliation (table diff): two deterministic snapshots
    // of orders (rows dropped on each side, prices/priorities mutated
    // on one) full-outer-joined on the key into row-level
    // added/removed/changed verdicts with per-column change flags — the
    // lakehouse audit that answers "what did yesterday's load change".
    // Scale shape: ONE full-outer sort-merge join on the snapshot key
    // (bucket both snapshots by key at 100 TB and it's shuffle-free);
    // the unchanged mass is filtered before anything leaves the join.
    GraftQuery(
      "x_table_diff",
      (s, dir) => {
        val o = Tables.orders(s, dir).select(col("o_orderkey"),
          cents(col("o_totalprice")).as("cents"),
          col("o_orderpriority").as("prio"))
        val snapA = o.filter(col("o_orderkey") % 97 =!= 3)
        val snapB = o.filter(col("o_orderkey") % 97 =!= 5)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 11 === 0, col("cents") + 100)
              .otherwise(col("cents")).as("cents"),
            when(col("o_orderkey") % 13 === 0, lit("9-RECHECK"))
              .otherwise(col("prio")).as("prio"))
        // size-aware join pick (the bloom-residual-join precedent): the
        // shuffle-hash FOJ skips both sorts and is 5× faster when the
        // build side's per-task hash map fits executor memory, but it
        // OOMs outright at 150M build rows — past the threshold the
        // robust sort-merge takes over. The cutoff is a cluster-shape
        // decision (size it to executor memory × shuffle parallelism).
        val shjFits = snapB.queryExecution.optimizedPlan.stats.sizeInBytes <
          (1L << 28)
        snapA.as("a")
          .join(if (shjFits) snapB.as("b").hint("shuffle_hash")
                else snapB.as("b"),
            col("a.o_orderkey") === col("b.o_orderkey"), "full_outer")
          .select(
            coalesce(col("a.o_orderkey"), col("b.o_orderkey"))
              .as("o_orderkey"),
            when(col("a.o_orderkey").isNull, "added")
              .when(col("b.o_orderkey").isNull, "removed")
              .when(col("a.cents") =!= col("b.cents") ||
                col("a.prio") =!= col("b.prio"), "changed")
              .otherwise("unchanged").as("status"),
            coalesce(col("a.cents") =!= col("b.cents"), lit(false))
              .as("chg_price"),
            coalesce(col("a.prio") =!= col("b.prio"), lit(false))
              .as("chg_prio"))
          .filter(col("status") =!= "unchanged")
      },
      Some("""WITH o AS (SELECT o_orderkey,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS cents,
                     o_orderpriority AS prio FROM orders),
             a AS (SELECT * FROM o WHERE o_orderkey % 97 <> 3),
             b AS (SELECT o_orderkey,
                     CASE WHEN o_orderkey % 11 = 0 THEN cents + 100
                          ELSE cents END AS cents,
                     CASE WHEN o_orderkey % 13 = 0 THEN '9-RECHECK'
                          ELSE prio END AS prio
                   FROM o WHERE o_orderkey % 97 <> 5),
             j AS (SELECT coalesce(a.o_orderkey, b.o_orderkey)
                       AS o_orderkey,
                     CASE WHEN a.o_orderkey IS NULL THEN 'added'
                          WHEN b.o_orderkey IS NULL THEN 'removed'
                          WHEN a.cents <> b.cents OR a.prio <> b.prio
                            THEN 'changed'
                          ELSE 'unchanged' END AS status,
                     coalesce(a.cents <> b.cents, false) AS chg_price,
                     coalesce(a.prio <> b.prio, false) AS chg_prio
                   FROM a FULL OUTER JOIN b
                     ON a.o_orderkey = b.o_orderkey)
             SELECT o_orderkey, status, chg_price, chg_prio FROM j
             WHERE status <> 'unchanged'""")
    ),

    // Schema-evolution merged read: two parquet generations of the same
    // table (v2 adds a column), read back through Spark's mergeSchema
    // footer union — old files surface the new column as NULL. The
    // oracle derives the same union logically. Scale shape: schema
    // merge is a per-file FOOTER operation (no data pass); the
    // aggregate downstream is the usual one-scan group-by.
    GraftQuery(
      "x_schema_merge",
      (s, dir) => {
        // a 1/23 key sample: the merged-read path under test is a
        // per-file footer union — identical on a sample, so the gate
        // does not bill a full-table rewrite every run
        val o = Tables.orders(s, dir)
          .filter(col("o_orderkey") % 23 === 0)
          .select(col("o_orderkey"),
            cents(col("o_totalprice")).as("cents"),
            col("o_orderpriority").as("prio"))
        // ONE fixed scratch dir PER SESSION, overwritten per run — a
        // fresh createTempDirectory would leak two parquet snapshots
        // per invocation across bench/verify iterations, while a
        // host-global fixed path would let two concurrent sessions on
        // one machine clobber each other's files mid-read
        val tmp = new java.io.File(
          System.getProperty("java.io.tmpdir"),
          "graft_schema_merge_" + s.sparkContext.applicationId)
          .getAbsolutePath
        registerScratchCleanup(tmp)
        o.filter(col("o_orderkey") % 2 === 0).select("o_orderkey", "cents")
          .write.mode("overwrite").parquet(tmp + "/v1")
        o.filter(col("o_orderkey") % 2 =!= 0)
          .write.mode("overwrite").parquet(tmp + "/v2")
        s.read.option("mergeSchema", "true")
          .parquet(tmp + "/v1", tmp + "/v2")
          .groupBy(coalesce(col("prio"), lit("<missing>")).as("prio"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      },
      Some("""WITH o AS (SELECT o_orderkey,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) AS cents,
                     CASE WHEN o_orderkey % 2 = 0 THEN NULL
                          ELSE o_orderpriority END AS prio
                   FROM orders WHERE o_orderkey % 23 = 0)
             SELECT coalesce(prio, '<missing>') AS prio,
                    CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(cents) AS BIGINT) AS sum_cents
             FROM o GROUP BY 1""")
    ),

    // Sliding-window distinct users via PANE-SKETCH MERGING (the
    // mergeable twin of x_obs_sliding_distinct's exact form): raw
    // events aggregate into per-(series, 10-min pane) HLL registers
    // once; each 30-min hopping window merges its 3 pane sketches by
    // register max. The pane explode runs on register rows, never
    // events — the reason mergeable sketches exist at 100 TB.
    GraftQuery(
      "x_sketch_hll_sliding",
      (s, dir) =>
        graft.sketch.Sketches.hllSlidingEstimate(
          Tables.events(s, dir), col("event_type"),
          expr("ts_ns div 600000000000").as("pane"), col("user_id"),
          panes = 3),
      Some("""WITH e AS (SELECT event_type AS g,
                     epoch_ns(ts) // 600000000000 AS pane,
                     ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                       ::BIGINT AS h
                   FROM events),
             regs AS (SELECT g, pane, h % 256 AS bucket,
                       max(CASE WHEN h // 256 = 0 THEN 25
                           ELSE 25 - length(bin(h // 256)) END) AS register
                      FROM e GROUP BY 1, 2, 3),
             wr AS (SELECT g, pane + off AS win, bucket, register
                    FROM regs, (SELECT unnest(range(0, 3)) AS off)),
             mr AS (SELECT g, win, bucket, max(register) AS register
                    FROM wr GROUP BY 1, 2, 3),
             agg AS (SELECT g, win, CAST(count(*) AS BIGINT) AS nb,
                       CAST(sum(1::BIGINT << (25 - register)) AS BIGINT)
                         AS s_present
                     FROM mr GROUP BY 1, 2),
             fin AS (SELECT g, win, nb,
                       s_present + (256 - nb) * (1::BIGINT << 25)
                         AS s_scaled
                     FROM agg)
             SELECT g, win, nb AS nonzero_buckets, s_scaled,
                    (71827 * ((CAST(256 * 256 AS BIGINT) *
                      (1::BIGINT << 25)) // s_scaled)) // 100000 AS est
             FROM fin""")
    ),

    // ANN quality gate: recall@5 of the IVF nprobe=2 search against the
    // brute-force ground truth, per query, in integer basis points —
    // THE accept/reject metric for every approximate index the ANN
    // family ships (an index nobody measured recall on is not a search
    // path, it's a random number generator). Both rankings are already
    // individually oracle-gated (x_sim_cosine_topk, x_ann_ivf_search);
    // this joins them. Scale shape: ground truth runs on a bounded
    // query sample (10 queries — the audit pattern), so the brute-force
    // term stays a broadcast map-only pass however big the corpus.
    GraftQuery(
      "x_ann_recall",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
          .withColumn("embedding", col("embedding").cast("array<double>"))
        val queries = emb.filter(col("vec_id") < 10)
        val bf = graft.sim.Similarity.bruteForceTopK(
            emb, queries, "vec_id", "embedding", k = 5)
          .select(col("qid"), col("cid"))
        val ivf = graft.sim.Similarity.ivfTopK(
            emb, emb.filter(col("vec_id") % 100 === 0), queries,
            "vec_id", "embedding", k = 5, nprobe = 2)
          .select(col("qid").as("iqid"), col("cid").as("icid"))
        bf.join(ivf,
            col("qid") === col("iqid") && col("cid") === col("icid"),
            "left")
          .groupBy(col("qid"))
          .agg(count(col("icid")).as("n_hits"))
          .withColumn("recall_bp", col("n_hits") * 2000L)
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                         FROM embeddings WHERE vec_id < 10),
             c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                   FROM embeddings),
             bfd AS (SELECT qid, cid,
                       round(list_dot_product(qv, cv) /
                             (sqrt(list_dot_product(qv, qv)) *
                              sqrt(list_dot_product(cv, cv))), 3) AS cos
                     FROM q, c WHERE qid <> cid),
             bf AS (SELECT qid, cid FROM (
                      SELECT *, row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, cid) AS rank FROM bfd)
                    WHERE rank <= 5),
             cent AS (SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv2
                      FROM embeddings WHERE vec_id % 100 = 0),
             v AS (SELECT vec_id, embedding::DOUBLE[] AS ev
                   FROM embeddings),
             ascore AS (SELECT v.vec_id, c2.cent_id,
                          round(list_dot_product(v.ev, c2.cv2) /
                                (sqrt(list_dot_product(v.ev, v.ev)) *
                                 sqrt(list_dot_product(c2.cv2, c2.cv2))), 6)
                            AS cos
                        FROM v, cent c2),
             assign AS (SELECT vec_id, cent_id AS cell FROM (
                          SELECT *, row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cos DESC, cent_id) AS rnk
                          FROM ascore)
                        WHERE rnk = 1),
             probes AS (SELECT vec_id AS qid, cent_id AS cell FROM (
                          SELECT *, row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cos DESC, cent_id) AS rnk
                          FROM ascore WHERE vec_id < 10)
                        WHERE rnk <= 2),
             scored AS (SELECT p.qid, v2.vec_id AS cid,
                          round(list_dot_product(qv.ev, v2.ev) /
                                (sqrt(list_dot_product(qv.ev, qv.ev)) *
                                 sqrt(list_dot_product(v2.ev, v2.ev))), 3)
                            AS cos
                        FROM probes p
                        JOIN v qv ON qv.vec_id = p.qid
                        JOIN assign a ON a.cell = p.cell
                        JOIN v v2 ON v2.vec_id = a.vec_id
                        WHERE v2.vec_id <> p.qid),
             ivf AS (SELECT qid, cid FROM (
                       SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY cos DESC, cid) AS rank
                       FROM scored)
                     WHERE rank <= 5)
             SELECT bf.qid, CAST(count(ivf.cid) AS BIGINT) AS n_hits,
                    CAST(count(ivf.cid) * 2000 AS BIGINT) AS recall_bp
             FROM bf LEFT JOIN ivf
               ON bf.qid = ivf.qid AND bf.cid = ivf.cid
             GROUP BY 1""")
    )
  )
}
