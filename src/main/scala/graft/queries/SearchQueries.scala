package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.text.Search
import graft.graph.{GraphFixtures, PageRank, Triangles}

/** Search-and-graph gates: positional inverted index, phrase and boolean
  * retrieval over `documents`, and fixed-point PageRank over a planted
  * link graph. All oracle-replayable (positions as sorted CSV strings,
  * ranks as scale-10⁶ integers).
  */
object SearchQueries {

  /** Oracle token stream: 0-based word offsets, empties dropped. */
  private val T =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS l
                  FROM documents),
             ix AS (SELECT doc_id, l, unnest(range(0, len(l))) AS i FROM d),
             t AS (SELECT doc_id, l[i+1] AS term, i AS pos FROM ix
                   WHERE l[i+1] <> '')"""

  def all: Seq[GraftQuery] = Seq(

    // Positional inverted index: (term, doc) postings with tf and the
    // sorted position list; shuffled by term, partial-agg'd map-side.
    GraftQuery(
      "x_search_postings",
      (s, dir) =>
        Search.postings(Tables.documents(s, dir), col("doc_id"),
            col("text"))
          .withColumn("tf", col("tf").cast("long")),
      Some(T + """
             SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
                    CAST(min(pos) AS BIGINT) AS first_pos,
                    array_to_string(list_sort(list(pos)), ',') AS positions
             FROM t GROUP BY 1, 2""")
    ),

    // Exact phrase search: "table value" adjacency via a doc-keyed
    // position join (pos₂ = pos₁+1) — an equi-join, never a cross join.
    GraftQuery(
      "x_search_phrase",
      (s, dir) =>
        Search.phrase(Tables.documents(s, dir), col("doc_id"), col("text"),
          "table", "value"),
      Some(T + """
             SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_matches,
                    CAST(min(a.pos) AS BIGINT) AS first_pos
             FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
             WHERE a.term = 'table' AND b.term = 'value'
             GROUP BY 1""")
    ),

    // Boolean retrieval spark AND join AND NOT slow: one doc-keyed
    // aggregate over presence flags — no join anywhere.
    GraftQuery(
      "x_search_boolean",
      (s, dir) =>
        Search.boolean(Tables.documents(s, dir), col("doc_id"), col("text"),
          all = Seq("spark", "join"), none = Seq("slow")),
      Some(T + """
             SELECT doc_id FROM t GROUP BY 1
             HAVING max(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) = 1
                AND max(CASE WHEN term = 'join' THEN 1 ELSE 0 END) = 1
                AND max(CASE WHEN term = 'slow' THEN 1 ELSE 0 END) = 0""")
    ),

    // Fixed-point PageRank, 5 iterations, over a planted 3-out-degree
    // link graph (dst = (id·(k+2)+k) mod n, k=1..3). Integer arithmetic
    // end-to-end; the oracle unrolls the same five join-sum rounds.
    GraftQuery(
      "x_graph_pagerank",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val nodes = docs.select(col("doc_id").as("id"))
        val n = docs.agg(count(lit(1)).as("n"))
        val edges = nodes.crossJoin(broadcast(n))
          .select(col("id").as("src"), explode(array(
            expr("(id * 3 + 1) % n"), expr("(id * 4 + 2) % n"),
            expr("(id * 5 + 3) % n"))).as("dst"))
        PageRank.run(edges, nodes, iters = 5)
      },
      Some {
        val head =
          """WITH nodes AS (SELECT doc_id AS id FROM documents),
             nn AS (SELECT count(*) AS n FROM documents),
             e AS (SELECT id AS src, (id * 3 + 1) % n AS dst FROM nodes, nn
                   UNION ALL
                   SELECT id, (id * 4 + 2) % n FROM nodes, nn
                   UNION ALL
                   SELECT id, (id * 5 + 3) % n FROM nodes, nn),
             deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e
                     GROUP BY 1),
             r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
        val iters = (1 to 5).map { i =>
          s""",
             c$i AS (SELECT e.dst AS id, sum(r.r // deg.deg) AS s
                     FROM e JOIN deg USING (src)
                       JOIN r${i - 1} r ON r.id = e.src
                     GROUP BY 1),
             r$i AS (SELECT n.id,
                       CAST(150000 + (850000 * coalesce(c$i.s, 0)) // 1000000
                         AS BIGINT) AS r
                     FROM nodes n LEFT JOIN c$i USING (id))"""
        }.mkString
        head + iters + """
             SELECT id, r AS rank_fp FROM r5"""
      }
    ),

    // BM25 top-10 per query term, all factors exact rationals (k1=6/5,
    // b=3/4) — the ONLY float op is one double division of identical
    // BIGINT operands, so the ranking hash-matches DuckDB bit-for-bit.
    GraftQuery(
      "x_search_bm25",
      (s, dir) =>
        Search.bm25(Tables.documents(s, dir), col("doc_id"), col("text"),
          Seq("hash", "scan"), k = 10),
      Some(T + """,
             dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
                    FROM t GROUP BY 1),
             tot AS (SELECT CAST(count(*) AS BIGINT) AS s_tokens FROM t),
             nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs
                    FROM documents),
             tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
                    FROM t WHERE term IN ('hash', 'scan') GROUP BY 1, 2),
             tfd AS (SELECT term, doc_id, tf,
                       CAST(count(*) OVER (PARTITION BY term) AS BIGINT)
                         AS df
                     FROM tf),
             sc AS (SELECT term, doc_id, tf, dl,
                      CAST((2 * n_docs - 2 * df + 1) * 22 * tf * s_tokens
                        AS DOUBLE) /
                      CAST((2 * df + 1) * (10 * tf * s_tokens +
                        3 * s_tokens + 9 * dl * n_docs) AS DOUBLE)
                        AS score
                    FROM tfd JOIN dl USING (doc_id), tot, nn),
             rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY term
                      ORDER BY score DESC, doc_id) AS BIGINT) AS rk
                    FROM sc)
             SELECT term, doc_id, tf, dl, score, rk
             FROM rk WHERE rk <= 10""")
    ),

    // Hybrid retrieval: lexical (BM25, term 'hash') ⊕ dense (cosine of
    // embedding 0, documents ↔ embeddings aligned by id) fused by
    // reciprocal-rank fusion with integer fixed-point contributions —
    // the rrf operator OpenSearch/Elasticsearch ship. Fusion input is
    // bounded (two top-20 legs), so the operator is corpus-size-free;
    // the legs carry the scale story and are independently gated
    // (x_search_bm25, x_sim_cosine_topk).
    GraftQuery(
      "x_search_hybrid_rrf",
      (s, dir) => {
        val lex = Search.bm25(Tables.documents(s, dir), col("doc_id"),
            col("text"), Seq("hash"), k = 20)
          .select(col("doc_id"), col("rk"))
        val emb = Tables.embeddings(s, dir)
          .withColumn("embedding", col("embedding").cast("array<double>"))
        val dense = graft.sim.Similarity.bruteForceTopK(
            emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding",
            k = 20)
          .select(col("cid").as("doc_id"), col("rank").as("rk"))
        Search.rrfFuse(Seq(lex, dense), "doc_id", "rk",
          kRrf = 60, topK = 10)
      },
      Some(T + """,
             dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
                    FROM t GROUP BY 1),
             tot AS (SELECT CAST(count(*) AS BIGINT) AS s_tokens FROM t),
             nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs
                    FROM documents),
             tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
                    FROM t WHERE term = 'hash' GROUP BY 1, 2),
             tfd AS (SELECT term, doc_id, tf,
                       CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df
                     FROM tf),
             sc AS (SELECT term, doc_id,
                      CAST((2 * n_docs - 2 * df + 1) * 22 * tf * s_tokens
                        AS DOUBLE) /
                      CAST((2 * df + 1) * (10 * tf * s_tokens +
                        3 * s_tokens + 9 * dl * n_docs) AS DOUBLE) AS score
                    FROM tfd JOIN dl USING (doc_id), tot, nn),
             lex AS (SELECT doc_id, rk FROM (
                       SELECT doc_id, CAST(row_number() OVER (
                         ORDER BY score DESC, doc_id) AS BIGINT) AS rk
                       FROM sc) WHERE rk <= 20),
             q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                   WHERE vec_id = 0),
             c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                   FROM embeddings),
             cos AS (SELECT cid,
                       round(list_dot_product(qv, cv) /
                             (sqrt(list_dot_product(qv, qv)) *
                              sqrt(list_dot_product(cv, cv))), 3) AS cos
                     FROM q, c WHERE cid <> 0),
             dense AS (SELECT cid AS doc_id, rk FROM (
                         SELECT cid, CAST(row_number() OVER (
                           ORDER BY cos DESC, cid) AS BIGINT) AS rk
                         FROM cos) WHERE rk <= 20),
             legs AS (SELECT * FROM lex UNION ALL SELECT * FROM dense),
             fused AS (SELECT doc_id,
                         CAST(sum(1000000000 // (60 + rk)) AS BIGINT)
                           AS rrf_fp,
                         CAST(count(*) AS BIGINT) AS n_legs
                       FROM legs GROUP BY 1)
             SELECT doc_id, rrf_fp, n_legs, rank FROM (
               SELECT *, CAST(row_number() OVER (
                 ORDER BY rrf_fp DESC, doc_id) AS BIGINT) AS rank
               FROM fused) WHERE rank <= 10""")
    ),

    // Degree-oriented triangle counting over the planted graph (3
    // arithmetic links + a 13-hub spoke): orientation makes the wedge
    // join skew-proof; one LEFT-join pass yields wedge + triangle counts.
    GraftQuery(
      "x_graph_triangles",
      (s, dir) => {
        // all three relations are session-cached fixtures; per run only
        // the wedge-close join and three cheap cached counts execute
        val tri = Triangles.wedgeClose(GraphFixtures.orientedPlanted(s, dir))
        val sizes = GraphFixtures.plantedEdges(s, dir)
          .agg(count(lit(1)).as("n_edges"))
          .crossJoin(broadcast(GraphFixtures.plantedDegrees(s, dir)
            .agg(count(lit(1)).as("n_nodes"))))
        val out = tri.crossJoin(broadcast(sizes))
          .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
            col("n_triangles"))
        val rows = java.util.Arrays.asList(out.collect(): _*)
        s.createDataFrame(rows, out.schema)
      },
      Some("""WITH nodes AS (SELECT doc_id AS id FROM documents),
             nn AS (SELECT count(*) AS n FROM documents),
             e0 AS (SELECT id AS s, (id * 3 + 1) % n AS d FROM nodes, nn
                    UNION ALL SELECT id, (id * 4 + 2) % n FROM nodes, nn
                    UNION ALL SELECT id, (id * 5 + 3) % n FROM nodes, nn
                    UNION ALL SELECT id, id % 13 FROM nodes),
             e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                   FROM e0 WHERE s <> d),
             deg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg
                     FROM (SELECT a AS v FROM e
                           UNION ALL SELECT b FROM e)
                     GROUP BY 1),
             o AS (SELECT CASE WHEN da.dg < db.dg OR
                       (da.dg = db.dg AND a < b) THEN a ELSE b END AS u,
                     CASE WHEN da.dg < db.dg OR
                       (da.dg = db.dg AND a < b) THEN b ELSE a END AS v,
                     CASE WHEN da.dg < db.dg OR
                       (da.dg = db.dg AND a < b) THEN db.dg ELSE da.dg END
                       AS dv
                   FROM e JOIN deg da ON da.v = e.a
                     JOIN deg db ON db.v = e.b),
             w AS (SELECT o1.x, o2.y FROM
                     (SELECT u, v AS x, dv AS dx FROM o) o1
                     JOIN (SELECT u, v AS y, dv AS dy FROM o) o2
                     USING (u)
                   WHERE o1.dx < o2.dy OR (o1.dx = o2.dy AND o1.x < o2.y)),
             tri AS (SELECT CAST(count(*) AS BIGINT) AS n_wedges,
                       CAST(count(o.u) AS BIGINT) AS n_triangles
                     FROM w LEFT JOIN o ON o.u = w.x AND o.v = w.y)
             SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
                    (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
                    n_wedges, n_triangles
             FROM tri""")
    )
  )
}
