package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables

/** Warehouse-surface gates: SCD2 dimension joins, ROLLUP subtotal trees,
  * and pivot tables — the OLAP idioms a user points at the engine's
  * tables once logs/metrics land as columns.
  */
object OlapQueries {

  def all: Seq[GraftQuery] = Seq(

    // SCD2 (type-2 slowly-changing dimension) join: each fact row joins
    // the dimension VERSION valid at its event time — customer-keyed
    // equi-join with the validity range as a post-join filter (never a
    // range-only join, so the plan is a hash/sort-merge equi-join; a
    // fact row matches exactly one version by construction).
    GraftQuery(
      "x_scd2_join",
      (s, dir) => {
        val dim = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey"))
          .withColumn("v", explode(typedLit(Seq(0, 1, 2))))
          .withColumn("vfrom",
            when(col("v") === 0, "1995-01-01")
              .when(col("v") === 1, "1997-01-01")
              .otherwise("1999-01-01").cast("timestamp"))
          .withColumn("vto",
            when(col("v") === 0, "1997-01-01")
              .when(col("v") === 1, "1999-01-01")
              .otherwise("2100-01-01").cast("timestamp"))
        Tables.orders(s, dir).join(dim,
            col("o_custkey") === col("c_custkey") &&
              col("o_orderdate") >= col("vfrom") &&
              col("o_orderdate") < col("vto"))
          .select(col("o_orderkey"), col("o_custkey"),
            concat(lit("v"), col("v")).as("seg"), col("c_nationkey"))
      },
      Some("""WITH dim AS (SELECT c_custkey, c_nationkey, v,
                     CASE v WHEN 0 THEN TIMESTAMP '1995-01-01'
                            WHEN 1 THEN TIMESTAMP '1997-01-01'
                            ELSE TIMESTAMP '1999-01-01' END AS vfrom,
                     CASE v WHEN 0 THEN TIMESTAMP '1997-01-01'
                            WHEN 1 THEN TIMESTAMP '1999-01-01'
                            ELSE TIMESTAMP '2100-01-01' END AS vto
                   FROM customer, (SELECT unnest(range(0, 3)) AS v))
             SELECT o_orderkey, o_custkey,
                    'v' || CAST(v AS VARCHAR) AS seg, c_nationkey
             FROM orders JOIN dim ON o_custkey = c_custkey
               AND o_orderdate >= vfrom AND o_orderdate < vto""")
    ),

    // ROLLUP subtotal tree over (year, priority): Spark's native rollup
    // operator vs SQL GROUP BY ROLLUP — NULL group keys mark subtotal
    // rows identically in both engines.
    GraftQuery(
      "x_olap_rollup",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(year(col("o_orderdate")).cast("long").as("yr"),
            col("o_orderpriority").as("prio"),
            col("o_totalprice"))
          .rollup(col("yr"), col("prio"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(28,6)")).cast("double")
              .as("revenue")),
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
                    o_orderpriority AS prio,
                    CAST(count(*) AS BIGINT) AS n_orders,
                    CAST(sum(CAST(o_totalprice AS DECIMAL(28,6)))
                      AS DOUBLE) AS revenue
             FROM orders
             GROUP BY ROLLUP (CAST(year(o_orderdate) AS BIGINT),
               o_orderpriority)""")
    ),

    // Table profiler (Deequ-shaped): per-column row/null/distinct
    // counts and lexicographic min/max via ONE stack + ONE aggregate —
    // column count, not row count, sets the output size.
    GraftQuery(
      "x_profile_table",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .select(expr(
            "stack(4, 'l_orderkey', CAST(l_orderkey AS STRING), " +
              "'l_linenumber', CAST(l_linenumber AS STRING), " +
              "'l_returnflag', l_returnflag, " +
              "'l_linestatus', l_linestatus) AS (col_name, val)"))
          .groupBy(col("col_name"))
          .agg(count(lit(1)).as("n"),
            sum(col("val").isNull.cast("long")).as("n_null"),
            countDistinct(col("val")).as("n_distinct"),
            min(col("val")).as("vmin"), max(col("val")).as("vmax")),
      Some("""WITH u AS (
               SELECT 'l_orderkey' AS col_name,
                      CAST(l_orderkey AS VARCHAR) AS val FROM lineitem
               UNION ALL SELECT 'l_linenumber',
                      CAST(l_linenumber AS VARCHAR) FROM lineitem
               UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
               UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem)
             SELECT col_name, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_null,
                    CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
                    min(val) AS vmin, max(val) AS vmax
             FROM u GROUP BY 1""")
    ),

    // Incremental aggregation maintenance: merge yesterday's partials
    // with today's delta partials by RE-AGGREGATING THE PARTIALS —
    // never rescanning the base — and prove equality with the full
    // recompute (the `ok` column the oracle replays).
    GraftQuery(
      "x_incremental_agg",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("cents", graft.obs.Observability.cents(col("value")))
          .withColumn("day", expr("ts_ns div 86400000000000"))
        def partials(f: org.apache.spark.sql.DataFrame) =
          f.groupBy(col("event_type"))
            .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("sc"))
        val merged = partials(ev.filter(col("day") < lit(19733L)))
          .union(partials(ev.filter(col("day") >= lit(19733L))))
          .groupBy(col("event_type"))
          .agg(sum(col("cnt")).as("cnt"), sum(col("sc")).as("sum_cents"))
        val full = partials(ev)
          .select(col("event_type").as("ft"), col("cnt").as("fcnt"),
            col("sc").as("fsc"))
        merged.join(full, col("event_type") === col("ft"))
          .select(col("event_type"), col("cnt"), col("sum_cents"),
            (col("cnt") === col("fcnt") &&
              col("sum_cents") === col("fsc")).as("ok"))
      },
      Some("""WITH e AS (SELECT event_type,
                     epoch_ns(ts) // 86400000000000 AS day,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents
                   FROM events),
             p1 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
                      CAST(sum(cents) AS BIGINT) AS sc
                    FROM e WHERE day < 19733 GROUP BY 1),
             p2 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
                      CAST(sum(cents) AS BIGINT) AS sc
                    FROM e WHERE day >= 19733 GROUP BY 1),
             m AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS cnt,
                     CAST(sum(sc) AS BIGINT) AS sum_cents
                   FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
                   GROUP BY 1),
             f AS (SELECT event_type, CAST(count(*) AS BIGINT) AS fcnt,
                     CAST(sum(cents) AS BIGINT) AS fsc
                   FROM e GROUP BY 1)
             SELECT m.event_type, m.cnt, m.sum_cents,
                    m.cnt = f.fcnt AND m.sum_cents = f.fsc AS ok
             FROM m JOIN f USING (event_type)""")
    ),

    // Salted skew join: half the fact rows share ONE key; the salt
    // spreads that key over 8 lanes while the result stays exactly the
    // plain join's (the oracle IS the plain join).
    GraftQuery(
      "x_join_salted",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val fact = ev.select(col("event_id"),
          when(col("event_id") % 2 === 0, 0L).otherwise(col("user_id"))
            .as("jk"))
        val dim = ev.select(col("user_id").as("dkey")).distinct()
          .withColumn("grp", concat(lit("g"), col("dkey") % 5))
        graft.ops.SkewJoin.saltedJoin(fact, dim, col("jk"), col("dkey"),
            col("event_id"), salt = 8)
          .select(col("event_id"), col("jk"), col("grp"))
      },
      Some("""WITH f AS (SELECT event_id,
                     CASE WHEN event_id % 2 = 0 THEN 0 ELSE user_id END
                       AS jk FROM events),
             d AS (SELECT DISTINCT user_id AS dkey FROM events),
             dd AS (SELECT dkey, 'g' || CAST(dkey % 5 AS VARCHAR) AS grp
                    FROM d)
             SELECT f.event_id, f.jk, dd.grp
             FROM f JOIN dd ON f.jk = dd.dkey""")
    ),

    // CDC latest-wins merge: a synthesized change log (1-3 versions per
    // order, some ending in a delete) folds to final table state with
    // ONE struct-max aggregate — no window, no sort, deletes erased.
    GraftQuery(
      "x_cdc_merge",
      (s, dir) => {
        val changes = Tables.orders(s, dir)
          .withColumn("k", explode(typedLit(Seq(0, 1, 2))))
          .filter(col("k") === 0 ||
            (col("k") === 1 && col("o_orderkey") % 3 === 0) ||
            (col("k") === 2 && col("o_orderkey") % 9 === 0))
          .select(col("o_orderkey"), col("k").cast("long").as("seq"),
            when(col("k") === 2 && col("o_orderkey") % 18 === 0, "D")
              .otherwise("U").as("op"),
            ((col("o_totalprice").cast("decimal(18,2)") * 100)
              .cast("long") + col("k")).as("val"))
        graft.ops.Cdc.merge(changes, col("o_orderkey"), col("seq"),
            col("op"), col("val"))
          .withColumnRenamed("key", "o_orderkey")
          .withColumnRenamed("payload", "val")
      },
      Some("""WITH ch AS (SELECT o_orderkey, CAST(k AS BIGINT) AS seq,
                     CASE WHEN k = 2 AND o_orderkey % 18 = 0 THEN 'D'
                          ELSE 'U' END AS op,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) + k AS val
                   FROM orders, (SELECT unnest(range(0, 3)) AS k)
                   WHERE k = 0 OR (k = 1 AND o_orderkey % 3 = 0)
                      OR (k = 2 AND o_orderkey % 9 = 0))
             SELECT o_orderkey, CAST(max(seq) AS BIGINT) AS seq,
                    CAST(arg_max(val, seq) AS BIGINT) AS val
             FROM ch GROUP BY 1
             HAVING arg_max(op, seq) <> 'D'""")
    ),

    // Higher-order array functions: per-doc token stats via
    // transform/aggregate/filter — NO explode, so the plan has no
    // Generate and the row count never inflates.
    GraftQuery(
      "x_array_hof",
      (s, dir) =>
        Tables.documents(s, dir).select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          expr("aggregate(transform(split(text, ' '), x -> length(x)), " +
            "0L, (a, x) -> a + x)").as("chars_sum"),
          expr("CAST(array_max(transform(split(text, ' '), " +
            "x -> length(x))) AS BIGINT)").as("max_len"),
          expr("CAST(size(filter(split(text, ' '), " +
            "x -> length(x) >= 6)) AS BIGINT)").as("n_long")),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS l
                         FROM documents)
             SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
                    CAST(list_aggregate(list_transform(l,
                      x -> length(x)), 'sum') AS BIGINT) AS chars_sum,
                    CAST(list_aggregate(list_transform(l,
                      x -> length(x)), 'max') AS BIGINT) AS max_len,
                    CAST(len(list_filter(l, x -> length(x) >= 6))
                      AS BIGINT) AS n_long
             FROM d""")
    ),

    // Semi-structured VARIANT path (Spark 4): parse_json once, typed
    // variant_get extraction of nested fields and array elements — the
    // engine-native answer to fluent-bit's JSON-first record model.
    GraftQuery(
      "x_json_variant",
      (s, dir) => {
        val k = regexp_extract(col("props"), "[0-9]+", 0)
        val js = concat(lit("{\"k\":"), k,
          lit(",\"user\":{\"id\":"), col("user_id"),
          lit(",\"tier\":\"t"), col("user_id") % 3,
          lit("\"},\"tags\":[\"a\",\"e\"]}"))
        Tables.events(s, dir).withColumn("js", js)
          .select(col("event_id"),
            expr("variant_get(parse_json(js), '$.k', 'long')").as("k"),
            expr("variant_get(parse_json(js), '$.user.tier', 'string')")
              .as("tier"),
            expr("variant_get(parse_json(js), '$.tags[1]', 'string')")
              .as("tag1"))
      },
      Some("""WITH j AS (SELECT event_id,
                     '{"k":' || regexp_extract(props, '[0-9]+') ||
                     ',"user":{"id":' || user_id ||
                     ',"tier":"t' || CAST(user_id % 3 AS VARCHAR) ||
                     '"},"tags":["a","e"]}' AS js
                   FROM events)
             SELECT event_id,
                    CAST(json_extract(js, '$.k') AS BIGINT) AS k,
                    json_extract_string(js, '$.user.tier') AS tier,
                    json_extract_string(js, '$.tags[1]') AS tag1
             FROM j""")
    ),

    // k=v pair mining with regexp_extract_all: every pair in every line
    // explodes to (key, value) and aggregates — the generic structured-
    // field harvest over free-form logs.
    GraftQuery(
      "x_parse_kv_pairs",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("cents", graft.obs.Observability.cents(col("value")))
        ev.withColumn("p",
            explode(expr(
              "regexp_extract_all(" +
                "concat('sev=', user_id % 5, ' bytes=', cents, " +
                "' retry=', regexp_extract(props, '[0-9]+', 0)), " +
                "'[a-z]+=[0-9]+', 0)")))
          .select(substring_index(col("p"), "=", 1).as("key"),
            expr("CAST(substring(p, instr(p, '=') + 1) AS BIGINT)")
              .as("v"))
          .groupBy(col("key"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("vsum"))
      },
      Some("""WITH s AS (SELECT 'sev=' || CAST(user_id % 5 AS VARCHAR) ||
                     ' bytes=' || CAST(CAST(CAST(value AS DECIMAL(18,2))
                       * 100 AS BIGINT) AS VARCHAR) ||
                     ' retry=' || regexp_extract(props, '[0-9]+') AS line
                   FROM events),
             p AS (SELECT unnest(regexp_extract_all(line,
                     '[a-z]+=[0-9]+')) AS p FROM s)
             SELECT string_split(p, '=')[1] AS key,
                    CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(CAST(string_split(p, '=')[2] AS BIGINT))
                      AS BIGINT) AS vsum
             FROM p GROUP BY 1""")
    ),

    // Window-function parity suite: lead/lag/ntile/percent_rank/
    // cume_dist over the same total-ordered series partition — rank
    // ratios are IEEE divisions of identical integers, so doubles match
    // bit-for-bit.
    GraftQuery(
      "x_olap_window_suite",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))
          .orderBy(col("ts_ns"), col("event_id"))
        Tables.events(s, dir)
          .select(col("event_type"), col("event_id"), col("ts_ns"))
          .withColumn("prev_id", lag(col("event_id"), 1).over(w))
          .withColumn("next_id", lead(col("event_id"), 1).over(w))
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .withColumn("pr", percent_rank().over(w))
          .withColumn("cd", cume_dist().over(w))
          .drop("ts_ns")
      },
      Some("""SELECT event_type, event_id,
                    lag(event_id) OVER w AS prev_id,
                    lead(event_id) OVER w AS next_id,
                    CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                    percent_rank() OVER w AS pr,
                    cume_dist() OVER w AS cd
             FROM events
             WINDOW w AS (PARTITION BY event_type
               ORDER BY epoch_ns(ts), event_id)""")
    ),

    // Pivot: per-day event counts spread into one column per type —
    // Spark's pivot operator with explicit values (a bounded column
    // fan-out; the aggregate partial-combines map-side like any groupBy).
    GraftQuery(
      "x_olap_pivot",
      (s, dir) =>
        Tables.events(s, dir)
          .select(expr("ts_ns div 86400000000000").as("day"),
            col("event_type"))
          .groupBy(col("day"))
          .pivot("event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L,
            Seq("click", "error", "purchase", "signup", "view")),
      Some("""WITH e AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
                     event_type FROM events)
             SELECT day,
                    CAST(count(CASE WHEN event_type = 'click' THEN 1 END)
                      AS BIGINT) AS click,
                    CAST(count(CASE WHEN event_type = 'error' THEN 1 END)
                      AS BIGINT) AS error,
                    CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
                      AS BIGINT) AS purchase,
                    CAST(count(CASE WHEN event_type = 'signup' THEN 1 END)
                      AS BIGINT) AS signup,
                    CAST(count(CASE WHEN event_type = 'view' THEN 1 END)
                      AS BIGINT) AS view
             FROM e GROUP BY 1""")
    )
  )
}
