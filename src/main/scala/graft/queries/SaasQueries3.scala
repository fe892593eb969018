package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.obs.Observability

/** Product-analytics and governance gates over the events stream:
  * market-basket association rules (the apriori-pruned pair join), A/B
  * conversion lift, and a k-anonymity audit of quasi-identifier classes.
  * All integer-exact (ppm ratios via truncating div — identical in Spark
  * `div` and DuckDB `//`); every gate hash-matches a DuckDB replay.
  */
object SaasQueries3 {

  private def events(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir)
      .withColumn("cents", Observability.cents(col("value")))

  def all: Seq[GraftQuery] = Seq(

    // Association rules over user baskets (basket = user, item =
    // event_type): support / confidence / lift in exact ppm. The item
    // supports are aggregated FIRST and the pair join runs only over
    // min-support survivors (apriori prune, broadcast semi-join) — at
    // 100 TB the pair generator is the quadratic term, and pruning it
    // by support is what keeps it bounded.
    GraftQuery(
      "x_assoc_rules",
      (s, dir) => {
        // Four consumers (item supports, both pair-join sides, the user
        // total) share the distinct — persist the |users|·|items|-sized
        // relation instead of rescanning the event stream four times.
        val items = events(s, dir)
          .select(col("user_id"), col("event_type")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val minSupport = 2L
        val freq = items.groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= minSupport)
        // every user has ≥1 event, so the user total derives from the
        // cached distinct, not a second corpus scan
        val nUsers = items
          .agg(countDistinct(col("user_id")).as("n_users"))
        val pruned = items.join(
          broadcast(freq.select(col("event_type"))), Seq("event_type"),
          "left_semi")
        // pair generation is MAP-SIDE: collect each user's (pruned,
        // sorted) basket once, emit its C(k,2) combinations from the
        // array — no user-keyed self-join, no |items|² intermediate
        val sup = pruned.groupBy(col("user_id"))
          .agg(sort_array(collect_set(col("event_type"))).as("ts"))
          .select(explode(expr(
            """flatten(transform(ts, (x, i) ->
                 transform(slice(ts, i + 2, size(ts)),
                   y -> struct(x AS ta, y AS tb))))""")).as("p"))
          .groupBy(col("p.ta").as("ta"), col("p.tb").as("tb"))
          .agg(count(lit(1)).as("cnt_ab"))
        val ca = freq.select(col("event_type").as("ta"),
          col("cnt").as("cnt_a"))
        val cb = freq.select(col("event_type").as("tb"),
          col("cnt").as("cnt_b"))
        sup.join(broadcast(ca), "ta").join(broadcast(cb), "tb")
          .crossJoin(broadcast(nUsers))
          .select(col("ta"), col("tb"), col("cnt_ab"), col("cnt_a"),
            col("cnt_b"),
            expr("(1000000 * cnt_ab) div n_users").as("support_ppm"),
            expr("(1000000 * cnt_ab) div cnt_a").as("conf_a_ppm"),
            expr("(1000000 * cnt_ab) div cnt_b").as("conf_b_ppm"),
            expr("(1000000 * cnt_ab * n_users) div (cnt_a * cnt_b)")
              .as("lift_ppm"))
      },
      Some("""WITH items AS (SELECT DISTINCT user_id, event_type
                   FROM events),
             freq AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
                      FROM items GROUP BY 1 HAVING count(*) >= 2),
             nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                      AS n_users FROM events),
             pruned AS (SELECT i.user_id, i.event_type FROM items i
                        JOIN freq f USING (event_type)),
             sup AS (SELECT a.event_type AS ta, b.event_type AS tb,
                       CAST(count(*) AS BIGINT) AS cnt_ab
                     FROM pruned a JOIN pruned b
                       ON a.user_id = b.user_id
                         AND a.event_type < b.event_type
                     GROUP BY 1, 2)
             SELECT ta, tb, cnt_ab,
                    ca.cnt AS cnt_a, cb.cnt AS cnt_b,
                    (1000000 * cnt_ab) // n_users AS support_ppm,
                    (1000000 * cnt_ab) // ca.cnt AS conf_a_ppm,
                    (1000000 * cnt_ab) // cb.cnt AS conf_b_ppm,
                    (1000000 * cnt_ab * n_users) // (ca.cnt * cb.cnt)
                      AS lift_ppm
             FROM sup JOIN freq ca ON ca.event_type = sup.ta
               JOIN freq cb ON cb.event_type = sup.tb, nu""")
    ),

    // A/B conversion lift: variant = user_id parity, exposure = first
    // 'view', conversion = any later 'purchase'. One summary row; the
    // conversion probe is a keyed equi-join on user — nothing crosses
    // the driver, both sides shuffle once on user_id.
    GraftQuery(
      "x_ab_lift",
      (s, dir) => {
        val ev = events(s, dir)
        val fv = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts_ns")).as("fv"))
        val conv = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("ts_ns").as("pts"))
          .join(fv, col("pu") === col("user_id") &&
            col("pts") > col("fv"))
          .select(col("user_id")).distinct()
        val exp = fv.select(col("user_id"), (col("user_id") % 2).as("vr"))
        val cnv = conv.withColumn("vr", col("user_id") % 2)
        val eAgg = exp.groupBy(col("vr")).agg(count(lit(1)).as("exposed"))
        val cAgg = cnv.groupBy(col("vr")).agg(count(lit(1)).as("converted"))
        eAgg.join(cAgg, "vr")
          .agg(
            sum(when(col("vr") === 0L, col("exposed"))).as("exposed_a"),
            sum(when(col("vr") === 1L, col("exposed"))).as("exposed_b"),
            sum(when(col("vr") === 0L, col("converted"))).as("conv_a"),
            sum(when(col("vr") === 1L, col("converted"))).as("conv_b"))
          .select(col("exposed_a"), col("exposed_b"), col("conv_a"),
            col("conv_b"),
            expr("(1000000 * conv_a) div exposed_a").as("cr_a_ppm"),
            expr("(1000000 * conv_b) div exposed_b").as("cr_b_ppm"),
            expr("(1000000 * conv_b * exposed_a) div (conv_a * exposed_b)")
              .as("lift_ppm"))
      },
      Some("""WITH s AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns
                   FROM events),
             fv AS (SELECT user_id, min(ts_ns) AS fv FROM s
                    WHERE event_type = 'view' GROUP BY 1),
             conv AS (SELECT DISTINCT fv.user_id
                      FROM fv JOIN s p ON p.user_id = fv.user_id
                        AND p.event_type = 'purchase' AND p.ts_ns > fv.fv),
             e AS (SELECT user_id % 2 AS vr, CAST(count(*) AS BIGINT)
                     AS exposed FROM fv GROUP BY 1),
             c AS (SELECT user_id % 2 AS vr, CAST(count(*) AS BIGINT)
                     AS converted FROM conv GROUP BY 1),
             j AS (SELECT CAST(sum(CASE WHEN vr = 0 THEN exposed END)
                       AS BIGINT) AS exposed_a,
                     CAST(sum(CASE WHEN vr = 1 THEN exposed END)
                       AS BIGINT) AS exposed_b,
                     CAST(sum(CASE WHEN vr = 0 THEN converted END)
                       AS BIGINT) AS conv_a,
                     CAST(sum(CASE WHEN vr = 1 THEN converted END)
                       AS BIGINT) AS conv_b
                   FROM e JOIN c USING (vr))
             SELECT exposed_a, exposed_b, conv_a, conv_b,
                    (1000000 * conv_a) // exposed_a AS cr_a_ppm,
                    (1000000 * conv_b) // exposed_b AS cr_b_ppm,
                    (1000000 * conv_b * exposed_a) //
                      (conv_a * exposed_b) AS lift_ppm
             FROM j""")
    ),

    // k-anonymity audit: quasi-identifier class = (event_type, $20 value
    // band); distinct-user size per class and the k≥5 flag. One two-key
    // aggregate — the audit output is |classes| rows however big the
    // input.
    GraftQuery(
      "x_kanonymity",
      (s, dir) =>
        events(s, dir)
          .select(col("event_type"), expr("cents div 2000").as("band"),
            col("user_id"))
          .groupBy(col("event_type"), col("band"))
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_rows"))
          .withColumn("k_ok",
            when(col("n_users") >= 5L, lit(1L)).otherwise(lit(0L))),
      Some("""WITH s AS (SELECT event_type,
                     CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       // 2000 AS band,
                     user_id
                   FROM events)
             SELECT event_type, band,
                    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                    CAST(count(*) AS BIGINT) AS n_rows,
                    CAST(CASE WHEN count(DISTINCT user_id) >= 5 THEN 1
                      ELSE 0 END AS BIGINT) AS k_ok
             FROM s GROUP BY 1, 2""")
    )
  )
}
