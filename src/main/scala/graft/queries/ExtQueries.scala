package graft.queries

import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.TextAnalysis

/** Training-data-pipeline extensions (dedup, similarity, text analysis,
  * multimodal) as oracle-gated queries over `documents` / `embeddings`.
  */
object ExtQueries {

  /** DuckDB replay of [[graft.sim.Similarity.kmeansTrain]] (k-means,
    * two Lloyd's iterations unrolled as chained CTEs) + the final
    * assignment. Mirrors the Spark side exactly: id<k init,
    * round(cos, 6) + cent_id tiebreak assignment, and per-dimension
    * means over fixed-point long sums (`floor(x*1e9 + 0.5)::BIGINT`,
    * then `CAST(sum AS DOUBLE)/1e9/count`) — exact integer math both
    * engines replay bit-for-bit, ~7× faster than decimal accumulators,
    * and floor (unlike round) stays primitive in Spark codegen.
    */
  private def kmeansOracle(k: Int, dim: Int): String = {
    def scoreCte(name: String, cents: String) =
      s"""$name AS (SELECT v.vec_id, c.cent_id,
            round(list_dot_product(v.ev, c.cv) /
                  (sqrt(list_dot_product(v.ev, v.ev)) *
                   sqrt(list_dot_product(c.cv, c.cv))), 6) AS cos
          FROM v, $cents c)"""
    def assignCte(name: String, score: String) =
      s"""$name AS (SELECT vec_id, cent_id AS cell, cos FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY cos DESC, cent_id) AS rnk FROM $score)
          WHERE rnk = 1)"""
    def centCte(name: String, assign: String) = {
      val means = (1 to dim).map(i =>
        s"CAST(SUM(CAST(floor(v.ev[$i] * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)/1000000000/count(*)")
      s"""$name AS (SELECT $assign.cell AS cent_id,
            list_value(${means.mkString(", ")}) AS cv
          FROM v JOIN $assign USING (vec_id) GROUP BY $assign.cell)"""
    }
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
       c0 AS (SELECT vec_id AS cent_id, ev AS cv FROM v WHERE vec_id < $k),
       ${scoreCte("s1", "c0")}, ${assignCte("a1", "s1")}, ${centCte("c1", "a1")},
       ${scoreCte("s2", "c1")}, ${assignCte("a2", "s2")}, ${centCte("c2", "a2")},
       ${scoreCte("s3", "c2")}, ${assignCte("a3", "s3")}
       SELECT vec_id, cell, cos FROM a3"""
  }

  /** DuckDB replay of [[graft.sim.Similarity.semDedup]]: the same
    * two-iteration k-means chain as [[kmeansOracle]] (a3 = final
    * assignment), then within-cell pairwise cosine against lower ids.
    */
  private def semDedupOracle(k: Int, dim: Int, threshold: Double): String = {
    val chain = kmeansOracle(k, dim)
      .stripSuffix("SELECT vec_id, cell, cos FROM a3").trim.stripSuffix(",")
    s"""$chain,
       pairs AS (
         SELECT a.vec_id,
                round(list_dot_product(va.ev, vb.ev) /
                      (sqrt(list_dot_product(va.ev, va.ev)) *
                       sqrt(list_dot_product(vb.ev, vb.ev))), 6) AS pcos
         FROM a3 a JOIN a3 b ON a.cell = b.cell AND b.vec_id < a.vec_id
         JOIN v va ON va.vec_id = a.vec_id
         JOIN v vb ON vb.vec_id = b.vec_id),
       mx AS (SELECT vec_id, max(pcos) AS nn FROM pairs GROUP BY 1)
       SELECT a.vec_id, a.cell,
              coalesce(mx.nn, -1.0) AS nn_cos,
              CASE WHEN coalesce(mx.nn, -1.0) >= $threshold
                   THEN 1 ELSE 0 END AS is_dup
       FROM a3 a LEFT JOIN mx USING (vec_id)"""
  }

  /** DuckDB replay of [[graft.sim.Similarity.semDedupScaled]]: the same
    * two-iteration k-means chain as [[kmeansOracle]] and the identical
    * fixed-point mean update, but the assignment argmax replays the
    * [[graft.functions.NearestCell]] kernel — fixed-point
    * floor(cos·1e6+0.5), ties to the LOWER centroid id (the
    * `ascore`/`assign` pattern the x_ann_ivfpq oracle already uses) —
    * then within-cell pairwise cosine against lower ids, as
    * [[semDedupOracle]].
    */
  private def semDedupOracleScaled(kSql: String, dim: Int,
                                   threshold: Double): String = {
    def scoreCte(name: String, cents: String) =
      s"""$name AS (SELECT v.vec_id, c.cent_id,
            CAST(floor((list_dot_product(v.ev, c.cv) /
                  (sqrt(list_dot_product(v.ev, v.ev)) *
                   sqrt(list_dot_product(c.cv, c.cv))))*1000000 + 0.5)
              AS BIGINT) AS fs
          FROM v, $cents c)"""
    def assignCte(name: String, score: String) =
      s"""$name AS (SELECT vec_id, cent_id AS cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY fs DESC, cent_id) AS rnk FROM $score)
          WHERE rnk = 1)"""
    def centCte(name: String, assign: String) = {
      val means = (1 to dim).map(i =>
        s"CAST(SUM(CAST(floor(v.ev[$i] * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)/1000000000/count(*)")
      s"""$name AS (SELECT $assign.cell AS cent_id,
            list_value(${means.mkString(", ")}) AS cv
          FROM v JOIN $assign USING (vec_id) GROUP BY $assign.cell)"""
    }
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
       c0 AS (SELECT vec_id AS cent_id, ev AS cv FROM v WHERE vec_id < $kSql),
       ${scoreCte("s1", "c0")}, ${assignCte("a1", "s1")}, ${centCte("c1", "a1")},
       ${scoreCte("s2", "c1")}, ${assignCte("a2", "s2")}, ${centCte("c2", "a2")},
       ${scoreCte("s3", "c2")}, ${assignCte("a3", "s3")},
       pairs AS (
         SELECT a.vec_id,
                round(list_dot_product(va.ev, vb.ev) /
                      (sqrt(list_dot_product(va.ev, va.ev)) *
                       sqrt(list_dot_product(vb.ev, vb.ev))), 6) AS pcos
         FROM a3 a JOIN a3 b ON a.cell = b.cell AND b.vec_id < a.vec_id
         JOIN v va ON va.vec_id = a.vec_id
         JOIN v vb ON vb.vec_id = b.vec_id),
       mx AS (SELECT vec_id, max(pcos) AS nn FROM pairs GROUP BY 1)
       SELECT a.vec_id, a.cell,
              coalesce(mx.nn, -1.0) AS nn_cos,
              CASE WHEN coalesce(mx.nn, -1.0) >= $threshold
                   THEN 1 ELSE 0 END AS is_dup
       FROM a3 a LEFT JOIN mx USING (vec_id)"""
  }

  /** DuckDB replay of [[graft.sim.Similarity.quantizedTopK]]: per-dim
    * min/max CTE, identical quantization expression (same IEEE op
    * order), exact integer dot-product scoring, total-ordered top-k.
    */
  private def quantizedOracle(dim: Int): String = {
    val ranges = (1 to dim).map(i =>
      s"min(ev[$i]) AS mn$i, max(ev[$i]) AS mx$i").mkString(", ")
    val quants = (1 to dim).map(i =>
      s"CASE WHEN r.mx$i = r.mn$i THEN 0.0 " +
        s"ELSE floor((ev[$i] - r.mn$i) * 255.0 / (r.mx$i - r.mn$i) + 0.5) END")
      .mkString(", ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
       r AS (SELECT $ranges FROM v),
       qv AS (SELECT vec_id, list_value($quants) AS q FROM v, r),
       scored AS (
         SELECT a.vec_id AS qid, b.vec_id AS cid,
                CAST(list_dot_product(a.q, b.q) AS BIGINT) AS score
         FROM qv a, qv b
         WHERE a.vec_id < 3 AND b.vec_id <> a.vec_id)
       SELECT qid, cid, score, rank FROM (
         SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY score DESC, cid) AS rank FROM scored)
       WHERE rank <= 5"""
  }

  /** Shared DuckDB CTEs: 3-gram shingles → k numeric minhashes
    * (universal hash family (a_i·x + b_i) mod 2^31-1 over the 32-bit md5
    * slice x, constants from Dedup.hashParams) → k/r bands of r →
    * candidate pairs (mirror of Dedup.shingles/minhash/bandSignatures/
    * candidatePairs).
    */
  // k=64, r=4 => 16 bands, candidate threshold (1/16)^(1/4) = 0.5 —
  // the tuned gate configuration (the library default minhashLsh keeps
  // k=128 for recall-critical dedup; the oracle mirrors whatever k is
  // used here via the shared constants).
  private[queries] val MinhashK = 64
  private[queries] val RowsPerBand = 4

  /** Shared DuckDB replay of simhash16 → banded-hamming pairs →
    * transitive closure (recursive CTE) ending in `comp(id, component)`
    * — the oracle spine of `x_dedup_cc`, reused by `x_corpus_curate`.
    */
  private val CcCtes: String = {
    val votes = (1 to 16).map(p =>
      s"sum(CASE WHEN ascii(substr(md5(tok), $p, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v$p")
      .mkString(", ")
    val bits = (1 to 16).map(p =>
      s"(CASE WHEN v$p >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
    val ham = (1 to 16).map(i =>
      s"CASE WHEN substr(ha, $i, 1) <> substr(hb, $i, 1) THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH RECURSIVE toks AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       v AS (SELECT doc_id, $votes FROM toks GROUP BY doc_id),
       sg AS (SELECT doc_id, $bits AS simhash16 FROM v),
       bands AS (
         SELECT doc_id, simhash16, t.b,
                substr(simhash16, CAST(t.b * 8 + 1 AS INT), 8) AS bsig
         FROM sg, (SELECT unnest(range(0, 2)) AS b) t),
       cand AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                a.simhash16 AS ha, b.simhash16 AS hb
         FROM bands a JOIN bands b
           ON a.b = b.b AND a.bsig = b.bsig AND a.doc_id < b.doc_id
         WHERE a.b = 0 OR substr(a.simhash16, 1, 8) <> substr(b.simhash16, 1, 8)),
       pairs AS (
         SELECT doc_a, doc_b FROM (
           SELECT doc_a, doc_b, $ham AS hamming FROM cand)
         WHERE hamming <= 1),
       edges AS (
         SELECT doc_a AS src, doc_b AS dst FROM pairs
         UNION
         SELECT doc_b, doc_a FROM pairs),
       reach AS (
         SELECT doc_id AS id, doc_id AS comp FROM documents
         UNION
         SELECT e.dst AS id, reach.comp AS comp
         FROM reach JOIN edges e ON e.src = reach.id),
       comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)"""
  }
  private val HashParamRows = Dedup.hashParams(MinhashK).zipWithIndex
    .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
  private[queries] val LshCtes = s"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS tok,
             unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
      FROM documents),
    sh0 AS (
      SELECT doc_id,
             tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
      FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    sh AS (SELECT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL),
    sx AS (
      SELECT doc_id,
             ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS x
      FROM sh),
    mh AS (
      SELECT doc_id, t.i, min((t.a * x + t.b) % 2147483647) AS mh
      FROM sx, (VALUES $HashParamRows) t(i, a, b)
      GROUP BY doc_id, t.i),
    bands AS (
      SELECT doc_id, CAST(i // $RowsPerBand AS INT) AS band,
             md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)) AS sig
      FROM mh GROUP BY doc_id, i // $RowsPerBand),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
  """

  /** WET segment builder shared by the three WARC queries: a warcinfo
    * head record plus one Content-Length-framed conversion record per
    * document (CRLF framing, octet lengths, URI/date/record-id
    * headers), grouped into 16 segments, optionally gzipped. The
    * framing lives in ONE place so the queries cannot drift apart;
    * callers parse with `Parsers.warc` and filter
    * `warc_type = 'conversion'`.
    */
  private def wetSegments(docs: org.apache.spark.sql.DataFrame,
                          payload: org.apache.spark.sql.Column,
                          gzip: Boolean): org.apache.spark.sql.DataFrame = {
    val crlf = "\r\n"
    val uri = concat(lit("https://"), col("source"), lit(".example.com/"),
      col("lang"), lit("/"), col("doc_id").cast("string"))
    val rec = concat(
      lit("WARC/1.0" + crlf + "WARC-Type: conversion" + crlf +
        "WARC-Target-URI: "), uri,
      lit(crlf + "WARC-Date: 2026-08-13T00:00:00Z" + crlf +
        "WARC-Record-ID: <urn:uuid:"), col("doc_id").cast("string"),
      lit(">" + crlf + "Content-Length: "),
      octet_length(payload).cast("string"),
      lit(crlf + crlf), payload, lit(crlf + crlf))
    val info = "WARC/1.0" + crlf + "WARC-Type: warcinfo" + crlf +
      "Content-Length: 0" + crlf + crlf + crlf + crlf
    // segment spread (r16): AQE coalesces the 16-group segment exchange
    // to ONE post-shuffle partition at bench scale, so the whole
    // downstream warc-scan → extract → gopher chain ran single-task
    // (1.48 s of the 2.3 s x_crawl_pipeline run). The segment count is
    // fixed at 16 by construction (doc_id % 16), so hash-repartitioning
    // 16 one-blob rows is free at every scale and spreads the blob
    // scanners across cores (hash, not range: repartitionByRange pays a
    // sampling job per action — measured a 2x slowdown on the small
    // x_warc_ingest gate). 64 partitions for 16 keys (r17, ADVICE r16):
    // pmod(hash(seg), 16) collides — on average only ~10 of 16
    // partitions were non-empty with 2-3 blobs sharing a task; at 64
    // the expected max-per-task drops to ~1 and the 16 one-blob rows
    // moved stay free at any scale.
    val plain = docs.groupBy((col("doc_id") % 16).as("seg"))
      .agg(concat_ws("", collect_list(rec)).as("recs"))
      .repartition(64, col("seg"))
      .select(encode(concat(lit(info), col("recs")), "UTF-8").as("blob"))
    if (gzip)
      plain.select(
        graft.functions.WarcFunctions.gzipCompress(col("blob")).as("blob"))
    else plain
  }

  val all: Seq[GraftQuery] = Seq(
    // Exact dedup: content-hash groups with representative + cardinality.
    GraftQuery(
      "x_dedup_exact",
      (s, dir) =>
        Dedup.exactGroups(Tables.documents(s, dir), col("doc_id"), col("text")),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
             count(*) AS n_dups FROM documents GROUP BY 1""")
    ),

    // MinHash LSH: banded candidate pairs + estimated Jaccard from
    // signature agreement.
    GraftQuery(
      "x_dedup_minhash",
      (s, dir) => {
        val sh = Dedup.shingles(Tables.documents(s, dir), col("doc_id"), col("text"), 3)
        val mh = Dedup.minhash(sh, MinhashK)
        // NOTE (r17): mh's chain recomputes once more for the
        // estimatedJaccard signature joins (their broadcast sides share
        // ONE build via broadcast-exchange reuse — Profile-verified). A
        // doc-keyed repartition can NOT be the sharing point here: the
        // r16 fanOut already partitions by doc_id, so the optimizer
        // removes the no-op exchange and the recompute stays.
        val pairs = Dedup.candidatePairs(Dedup.bandSignatures(mh, MinhashK, RowsPerBand))
        Dedup.estimatedJaccard(pairs, mh, MinhashK)
      },
      Some(LshCtes + s"""
        SELECT p.doc_a, p.doc_b,
               sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) / $MinhashK.0 AS est_jaccard
        FROM pairs p
        JOIN mh ma ON ma.doc_id = p.doc_a
        JOIN mh mb ON mb.doc_id = p.doc_b AND mb.i = ma.i
        GROUP BY p.doc_a, p.doc_b""")
    ),

    // Exact-substring duplicate detection (ExactSubstr, Lee et al.
    // 2022): stride-sampled 64-char windows, duplicated iff the exact
    // content recurs anywhere in the corpus; windows shuffle as 60-bit
    // md5-prefix hashes, never text. Catches verbatim reuse that
    // crosses token boundaries (license blocks, boilerplate).
    GraftQuery(
      "x_dedup_substring",
      (s, dir) =>
        Dedup.substringDup(Tables.documents(s, dir), col("doc_id"),
          col("text")),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS len
                         FROM documents),
             w AS (SELECT doc_id, text,
                    unnest(range(0, CASE WHEN len <= 64 THEN 1
                                    ELSE (len - 64) // 16 + 1 END)) AS i
                   FROM d),
             g AS (SELECT doc_id,
                    md5_number_lower(substring(text,
                        CAST(i*16 + 1 AS INT), 64)) AS h
                   FROM w),
             c AS (SELECT h, CAST(count(*) AS BIGINT) AS cnt
                   FROM g GROUP BY 1),
             s AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
                    CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_dup
                   FROM g JOIN c USING (h) GROUP BY 1)
             SELECT doc_id, n_windows, n_dup,
                    CASE WHEN n_dup*5 >= n_windows THEN 1 ELSE 0 END
                      AS flagged
             FROM s""")
    ),

    // Edit-distance fuzzy join (record linkage): q-gram equi-join
    // prefilter (pigeonhole-complete at these lengths) + stop-gram skew
    // guard + codegen levenshtein verify — near-identical content
    // fingerprints surface as pairs without an id×id cross product.
    // Strings are md5-derived version-suffixed fingerprints built from
    // orders (class = orderkey div 5, so linkage groups stay 5 wide at
    // EVERY scale — pair count grows linearly with the table): near
    // pairs share a 32-char prefix and differ in the version digits
    // (edit distance 1-2) while cross-class grams almost never collide.
    GraftQuery(
      "x_fuzzy_join",
      (s, dir) => {
        val strs = Tables.orders(s, dir).select(
          col("o_orderkey").as("id"),
          concat(md5(expr("o_orderkey div 5").cast("string")), lit("-"),
            (col("o_orderkey") % 5).cast("string"),
            (col("o_orderkey") % 3).cast("string")).as("s"))
        Dedup.editDistanceJoin(strs, col("id"), col("s"))
      },
      Some("""WITH s AS (SELECT o_orderkey AS id,
                     md5(CAST(o_orderkey // 5 AS VARCHAR)) || '-' ||
                     CAST(o_orderkey % 5 AS VARCHAR) ||
                     CAST(o_orderkey % 3 AS VARCHAR) AS s
                   FROM orders),
             g0 AS (SELECT id, s,
                     unnest(list_distinct([substr(s, i, 8)
                       FOR i IN range(1, length(s) - 6)])) AS gram
                    FROM s WHERE length(s) >= 8),
             hot AS (SELECT gram FROM
                      (SELECT gram, count(DISTINCT id) AS c
                       FROM g0 GROUP BY 1) WHERE c > 64),
             g AS (SELECT g0.* FROM g0 ANTI JOIN hot USING (gram)),
             cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                             a.s AS s_a, b.s AS s_b
                      FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id
                      WHERE abs(length(a.s) - length(b.s)) <= 2)
             SELECT id_a, id_b, CAST(levenshtein(s_a, s_b) AS INT) AS dist
             FROM cand WHERE levenshtein(s_a, s_b) <= 2""")
    ),

    // Fuzzy-pair clustering: the edit-distance join's survivors feed
    // the star-contraction components — near-identical fingerprints
    // collapse to one canonical id per linkage group (the record-
    // linkage endgame: verify pairs, then resolve entities). Oracle
    // replays the pairs and closes them with a recursive CTE.
    GraftQuery(
      "x_fuzzy_cluster",
      (s, dir) => {
        // a quarter of the linkage classes, kept INTACT (filter on the
        // class id, not the row id) — the resolution mechanics are the
        // subject here; x_fuzzy_join already pays the full-table pair
        // bill in the same suite
        val strs = Tables.orders(s, dir)
          .filter(expr("(o_orderkey div 5) % 4 = 0"))
          .select(
          col("o_orderkey").as("id"),
          concat(md5(expr("o_orderkey div 5").cast("string")), lit("-"),
            (col("o_orderkey") % 5).cast("string"),
            (col("o_orderkey") % 3).cast("string")).as("s"))
        val pairs = Dedup.editDistanceJoin(strs, col("id"), col("s"))
        graft.dedup.Components.clusters(strs, col("id"), pairs,
          "id_a", "id_b")
      },
      Some("""WITH RECURSIVE s AS (SELECT o_orderkey AS id,
                     md5(CAST(o_orderkey // 5 AS VARCHAR)) || '-' ||
                     CAST(o_orderkey % 5 AS VARCHAR) ||
                     CAST(o_orderkey % 3 AS VARCHAR) AS s
                   FROM orders
                   WHERE (o_orderkey // 5) % 4 = 0),
             g0 AS (SELECT id, s,
                     unnest(list_distinct([substr(s, i, 8)
                       FOR i IN range(1, length(s) - 6)])) AS gram
                    FROM s WHERE length(s) >= 8),
             hot AS (SELECT gram FROM
                      (SELECT gram, count(DISTINCT id) AS c
                       FROM g0 GROUP BY 1) WHERE c > 64),
             g AS (SELECT g0.* FROM g0 ANTI JOIN hot USING (gram)),
             cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                             a.s AS s_a, b.s AS s_b
                      FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id
                      WHERE abs(length(a.s) - length(b.s)) <= 2),
             pairs AS (SELECT id_a, id_b FROM cand
                       WHERE levenshtein(s_a, s_b) <= 2),
             edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                       UNION SELECT id_b, id_a FROM pairs),
             reach AS (SELECT id, id AS comp FROM s
                       UNION
                       SELECT e.dst AS id, reach.comp AS comp
                       FROM reach JOIN edges e ON e.src = reach.id),
             comp AS (SELECT id, min(comp) AS component FROM reach
                      GROUP BY id)
             SELECT id AS doc_id, component,
                    CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
                      AS cluster_size,
                    id = component AS is_canonical
             FROM comp""")
    ),

    // Exact n-gram Jaccard, computed only on LSH candidates (the scale
    // path: never O(n²)).
    GraftQuery(
      "x_dedup_jaccard",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.minhashLsh(docs, col("doc_id"), col("text"),
          k = MinhashK, rowsPerBand = RowsPerBand)
          .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 3).as("jac"))
      },
      Some(LshCtes + """,
        dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
        sz AS (SELECT doc_id, count(*) AS sz FROM dsh GROUP BY 1),
        inter AS (
          SELECT p.doc_a, p.doc_b, count(*) AS inter
          FROM pairs p
          JOIN dsh a ON a.doc_id = p.doc_a
          JOIN dsh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
          GROUP BY 1, 2)
        SELECT p.doc_a, p.doc_b,
               round(CAST(COALESCE(i.inter, 0) AS DOUBLE) /
                     (sa.sz + sb.sz - COALESCE(i.inter, 0)), 3) AS jac
        FROM pairs p
        LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
        JOIN sz sa ON sa.doc_id = p.doc_a
        JOIN sz sb ON sb.doc_id = p.doc_b""")
    ),

    // SimHash (portable 16-bit parity variant; 64-bit xxhash64 form in
    // Dedup.simhash64 is the production path).
    GraftQuery(
      "x_dedup_simhash",
      (s, dir) =>
        Dedup.simhash16(Tables.documents(s, dir), col("doc_id"), col("text")),
      Some {
        val votes = (1 to 16).map(p =>
          s"sum(CASE WHEN ascii(substr(md5(tok), $p, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v$p")
          .mkString(", ")
        val bits = (1 to 16).map(p =>
          s"(CASE WHEN v$p >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
        s"""WITH toks AS (
             SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           v AS (SELECT doc_id, $votes FROM toks GROUP BY doc_id)
           SELECT doc_id, $bits AS simhash16 FROM v"""
      }
    ),

    // SimHash banded-hamming near-dup pairs (2×8-bit bands over the
    // portable 16-bit signature; pigeonhole guarantees hamming≤1 pairs
    // share a band, so candidates are an equi-join, never all-pairs).
    GraftQuery(
      "x_dedup_simhash_pairs",
      (s, dir) =>
        Dedup.simhashPairs16(
          Dedup.simhash16(Tables.documents(s, dir), col("doc_id"), col("text")),
          maxHamming = 1),
      Some {
        val votes = (1 to 16).map(p =>
          s"sum(CASE WHEN ascii(substr(md5(tok), $p, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v$p")
          .mkString(", ")
        val bits = (1 to 16).map(p =>
          s"(CASE WHEN v$p >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
        val ham = (1 to 16).map(i =>
          s"CASE WHEN substr(ha, $i, 1) <> substr(hb, $i, 1) THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""WITH toks AS (
             SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           v AS (SELECT doc_id, $votes FROM toks GROUP BY doc_id),
           sg AS (SELECT doc_id, $bits AS simhash16 FROM v),
           bands AS (
             SELECT doc_id, simhash16, t.b,
                    substr(simhash16, CAST(t.b * 8 + 1 AS INT), 8) AS bsig
             FROM sg, (SELECT unnest(range(0, 2)) AS b) t),
           cand AS (
             SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    a.simhash16 AS ha, b.simhash16 AS hb
             FROM bands a JOIN bands b
               ON a.b = b.b AND a.bsig = b.bsig AND a.doc_id < b.doc_id
             WHERE a.b = 0 OR substr(a.simhash16, 1, 8) <> substr(b.simhash16, 1, 8))
           SELECT doc_a, doc_b, hamming FROM (
             SELECT doc_a, doc_b, $ham AS hamming FROM cand)
           WHERE hamming <= 1"""
      }
    ),

    // Brute-force cosine top-k (baseline ANN; broadcast queries, map-only
    // over the corpus).
    GraftQuery(
      "x_sim_cosine_topk",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
          .withColumn("embedding", col("embedding").cast("array<double>"))
        Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5)
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
                        FROM embeddings WHERE vec_id < 3),
             c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings),
             d AS (
               SELECT qid, cid,
                      round(list_dot_product(qv, cv) /
                            (sqrt(list_dot_product(qv, qv)) *
                             sqrt(list_dot_product(cv, cv))), 3) AS cos
               FROM q, c WHERE qid <> cid)
             SELECT qid, cid, cos, rank FROM (
               SELECT *, row_number() OVER (PARTITION BY qid
                         ORDER BY cos DESC, cid) AS rank FROM d)
             WHERE rank <= 5""")
    ),

    // Random-hyperplane LSH signatures (the bucketed ANN scale path).
    GraftQuery(
      "x_ann_lsh",
      (s, dir) =>
        Similarity.lshSignature(
          Tables.embeddings(s, dir)
            .withColumn("embedding", col("embedding").cast("array<double>")),
          "vec_id", "embedding", nPlanes = 8, dims = 64),
      Some("""WITH planes AS (
               SELECT p.p, d.d,
                      CAST(ascii(substr(md5(CAST(p.p AS VARCHAR) || '_' ||
                           CAST(d.d AS VARCHAR)), 1, 1)) - 80 AS DOUBLE) AS w
               FROM (SELECT unnest(range(0, 8)) AS p) p,
                    (SELECT unnest(range(0, 64)) AS d) d),
             proj AS (
               SELECT e.vec_id, pl.p,
                      sum(e.embedding[pl.d + 1]::DOUBLE * pl.w) AS s
               FROM embeddings e, planes pl GROUP BY 1, 2)
             SELECT vec_id,
                    string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, ''
                               ORDER BY p) AS lsh_sig
             FROM proj GROUP BY vec_id""")
    ),

    // Embedding-cosine near-dup (the dedup-by-embedding path): TWO
    // independent 8-plane LSH tables OR-amplify recall (a pair missed by
    // one table's buckets is caught by the other); candidates are the
    // deduped union, exact cosine only on candidates, top-3 per vector.
    GraftQuery(
      "x_dedup_embed",
      (s, dir) =>
        Similarity.lshTopK(
          Tables.embeddings(s, dir)
            .withColumn("embedding", col("embedding").cast("array<double>")),
          "vec_id", "embedding", nPlanes = 8, dims = 64, k = 3, nTables = 2),
      Some("""WITH planes AS (
               SELECT p.p, d.d,
                      CAST(ascii(substr(md5(CAST(p.p AS VARCHAR) || '_' ||
                           CAST(d.d AS VARCHAR)), 1, 1)) - 80 AS DOUBLE) AS w
               FROM (SELECT unnest(range(0, 16)) AS p) p,
                    (SELECT unnest(range(0, 64)) AS d) d),
             proj AS (
               SELECT e.vec_id, pl.p,
                      CASE WHEN sum(e.embedding[pl.d + 1]::DOUBLE * pl.w) >= 0
                        THEN '1' ELSE '0' END AS bit
               FROM embeddings e, planes pl GROUP BY e.vec_id, pl.p),
             sigs AS (
               SELECT vec_id, CAST(p // 8 AS INT) AS tbl,
                      string_agg(bit, '' ORDER BY p) AS sig
               FROM proj GROUP BY vec_id, p // 8),
             cand AS (
               SELECT DISTINCT a.vec_id AS qid, b.vec_id AS cid
               FROM sigs a JOIN sigs b
                 ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id),
             v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
             scored AS (
               SELECT c.qid, c.cid,
                      round(list_dot_product(va.ev, vb.ev) /
                            (sqrt(list_dot_product(va.ev, va.ev)) *
                             sqrt(list_dot_product(vb.ev, vb.ev))), 3) AS cos
               FROM cand c
               JOIN v va ON va.vec_id = c.qid
               JOIN v vb ON vb.vec_id = c.cid)
             SELECT qid, cid, cos FROM (
               SELECT *, row_number() OVER (PARTITION BY qid
                         ORDER BY cos DESC, cid) AS rnk FROM scored)
             WHERE rnk <= 3""")
    ),

    // IVF centroid training: two Lloyd's iterations (deterministic
    // id<k init, rounded-cosine assignment, exact decimal-sum means),
    // then the trained centroids feed ivfAssign for the final
    // partitioning. The oracle replays BOTH iterations unrolled as
    // chained CTEs — assignment flips on any centroid drift, and the
    // emitted per-vector cosine pins the trained centroid values into
    // the hash, so training is gated end-to-end, not just its shape.
    GraftQuery(
      "x_ann_kmeans",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        // final assignment is fused into one map-only argmax against the
        // trained literal centroids — no join tail after training
        val model = Similarity.kmeansTrainModel(emb, "vec_id", "embedding",
          k = 8, iters = 2, dim = 64)
        Similarity.kmeansAssign(emb, "vec_id", "embedding", model)
      },
      Some(kmeansOracle(k = 8, dim = 64))
    ),

    // Scalar-quantized top-k search (the 8× memory-compressed ANN
    // path): per-dim min/max ranges quantize to 0..255; scores are
    // exact integer dot products, so the oracle replays them
    // bit-for-bit with no rounding tolerance at all.
    GraftQuery(
      "x_ann_quantized",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 3),
          "vec_id", "embedding", k = 5, dim = 64)
      },
      Some(quantizedOracle(dim = 64))
    ),

    // IVF coarse quantization (the inverted-file ANN scale path):
    // deterministic centroid subset, per-vector best-cell assignment.
    GraftQuery(
      "x_ann_ivf",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
          .withColumn("embedding", col("embedding").cast("array<double>"))
        Similarity.ivfAssign(
          emb, emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding")
      },
      Some("""WITH cent AS (
               SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv
               FROM embeddings WHERE vec_id % 100 = 0),
             v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
             scored AS (
               SELECT v.vec_id, c.cent_id,
                      round(list_dot_product(v.ev, c.cv) /
                            (sqrt(list_dot_product(v.ev, v.ev)) *
                             sqrt(list_dot_product(c.cv, c.cv))), 6) AS cos
               FROM v, cent c)
             SELECT vec_id, cent_id AS cell FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id
                         ORDER BY cos DESC, cent_id) AS rnk FROM scored)
             WHERE rnk = 1""")
    ),

    // IVF cell search (nprobe=2): exact cosine top-k over the union of
    // each query's two nearest centroids' cells — the recall-correct
    // inverted-file search path (home cell alone misses cross-boundary
    // neighbors).
    GraftQuery(
      "x_ann_ivf_search",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
          .withColumn("embedding", col("embedding").cast("array<double>"))
        Similarity.ivfTopK(
          emb, emb.filter(col("vec_id") % 100 === 0),
          emb.filter(col("vec_id") < 3), "vec_id", "embedding",
          k = 5, nprobe = 2)
      },
      Some("""WITH cent AS (
               SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv
               FROM embeddings WHERE vec_id % 100 = 0),
             v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
             ascore AS (
               SELECT v.vec_id, c.cent_id,
                      round(list_dot_product(v.ev, c.cv) /
                            (sqrt(list_dot_product(v.ev, v.ev)) *
                             sqrt(list_dot_product(c.cv, c.cv))), 6) AS cos
               FROM v, cent c),
             assign AS (
               SELECT vec_id, cent_id AS cell FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                           ORDER BY cos DESC, cent_id) AS rnk FROM ascore)
               WHERE rnk = 1),
             probes AS (
               SELECT vec_id AS qid, cent_id AS cell FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                           ORDER BY cos DESC, cent_id) AS rnk
                 FROM ascore WHERE vec_id < 3)
               WHERE rnk <= 2),
             scored AS (
               SELECT p.qid, v2.vec_id AS cid,
                      round(list_dot_product(q.ev, v2.ev) /
                            (sqrt(list_dot_product(q.ev, q.ev)) *
                             sqrt(list_dot_product(v2.ev, v2.ev))), 3) AS cos
               FROM probes p
               JOIN v q ON q.vec_id = p.qid
               JOIN assign a ON a.cell = p.cell
               JOIN v v2 ON v2.vec_id = a.vec_id
               WHERE v2.vec_id <> p.qid)
             SELECT qid, cid, cos, rank FROM (
               SELECT *, row_number() OVER (PARTITION BY qid
                         ORDER BY cos DESC, cid) AS rank FROM scored)
             WHERE rank <= 5""")
    ),

    // Product-quantized ADC top-k (Jégou et al. 2011): 8 subspaces ×
    // 16 deterministic codewords; encode = per-subspace fixed-point L2
    // argmin byte-packed to 8 bytes/vector; search = per-query lookup
    // tables summed by the codegen PqAdcScore kernel. The oracle
    // replays codebook derivation, encode argmin (d² = |s|²−2sc+|c|²,
    // identical operand order) and the integer LUT sum bit-for-bit.
    GraftQuery(
      "x_ann_pq",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val books = Similarity.pqCodebooks(emb, "vec_id", "embedding",
          m = 8, dsub = 8, k = 16, step = 3)
        Similarity.pqTopK(emb, emb.filter(col("vec_id") < 3),
          "vec_id", "embedding", k = 5, books)
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev
                         FROM embeddings),
             ms AS (SELECT unnest(range(0, 8)) AS m),
             cw AS (SELECT CAST(vec_id // 3 AS INT) AS j, ev AS w
                    FROM v WHERE vec_id % 3 = 0 AND vec_id < 48),
             sub AS (SELECT vec_id, ms.m,
                            list_slice(ev, ms.m*8 + 1, ms.m*8 + 8) AS sv
                     FROM v, ms),
             cws AS (SELECT j, ms.m,
                            list_slice(w, ms.m*8 + 1, ms.m*8 + 8) AS cv
                     FROM cw, ms),
             dist AS (SELECT s.vec_id, s.m, c.j,
                      CAST(floor((list_dot_product(s.sv, s.sv)
                            - 2.0*list_dot_product(s.sv, c.cv)
                            + list_dot_product(c.cv, c.cv))*1000000 + 0.5)
                        AS BIGINT) AS d
                      FROM sub s JOIN cws c ON s.m = c.m),
             codes AS (SELECT vec_id, m, j AS code FROM (
                       SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                 ORDER BY d, j) AS rnk FROM dist)
                       WHERE rnk = 1),
             lut AS (SELECT s.vec_id AS qid, c.m, c.j,
                     CAST(floor(list_dot_product(s.sv, c.cv)*1000000 + 0.5)
                       AS BIGINT) AS ip
                     FROM sub s JOIN cws c ON c.m = s.m WHERE s.vec_id < 3),
             scored AS (SELECT l.qid, co.vec_id AS cid,
                               CAST(sum(l.ip) AS BIGINT) AS score
                        FROM codes co
                        JOIN lut l ON l.m = co.m AND l.j = co.code
                        WHERE co.vec_id <> l.qid GROUP BY 1, 2)
             SELECT qid, cid, score, rank FROM (
               SELECT *, row_number() OVER (PARTITION BY qid
                         ORDER BY score DESC, cid) AS rank FROM scored)
             WHERE rank <= 5""")
    ),

    // IVF-PQ search (faiss IVFx,PQy layout, by_residual=false): coarse
    // cells bound the candidate set (nprobe=2), 8-byte PQ codes bound
    // memory, ADC table lookups score. Oracle composes the x_ann_ivf
    // assignment/probe chain with the x_ann_pq codebook/code/LUT chain.
    GraftQuery(
      "x_ann_ivfpq",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val books = Similarity.pqCodebooks(emb, "vec_id", "embedding",
          m = 8, dsub = 8, k = 16, step = 3)
        Similarity.ivfPqTopK(
          emb.withColumn("embedding", col("embedding").cast("array<double>")),
          emb.filter(col("vec_id") % 100 === 0)
            .withColumn("embedding", col("embedding").cast("array<double>")),
          emb.filter(col("vec_id") < 3), "vec_id", "embedding",
          k = 5, nprobe = 2, books)
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev
                         FROM embeddings),
             ms AS (SELECT unnest(range(0, 8)) AS m),
             cwb AS (SELECT CAST(vec_id // 3 AS INT) AS j, ev AS w
                     FROM v WHERE vec_id % 3 = 0 AND vec_id < 48),
             sub AS (SELECT vec_id, ms.m,
                            list_slice(ev, ms.m*8 + 1, ms.m*8 + 8) AS sv
                     FROM v, ms),
             cws AS (SELECT j, ms.m,
                            list_slice(w, ms.m*8 + 1, ms.m*8 + 8) AS cv
                     FROM cwb, ms),
             dist AS (SELECT s.vec_id, s.m, c.j,
                      CAST(floor((list_dot_product(s.sv, s.sv)
                            - 2.0*list_dot_product(s.sv, c.cv)
                            + list_dot_product(c.cv, c.cv))*1000000 + 0.5)
                        AS BIGINT) AS d
                      FROM sub s JOIN cws c ON s.m = c.m),
             codes AS (SELECT vec_id, m, j AS code FROM (
                       SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                 ORDER BY d, j) AS rnk FROM dist)
                       WHERE rnk = 1),
             lut AS (SELECT s.vec_id AS qid, c.m, c.j,
                     CAST(floor(list_dot_product(s.sv, c.cv)*1000000 + 0.5)
                       AS BIGINT) AS ip
                     FROM sub s JOIN cws c ON c.m = s.m WHERE s.vec_id < 3),
             cent AS (SELECT vec_id AS cent_id, ev AS cv
                      FROM v WHERE vec_id % 100 = 0),
             ascore AS (SELECT v.vec_id, c.cent_id,
                        CAST(floor((list_dot_product(v.ev, c.cv) /
                              (sqrt(list_dot_product(v.ev, v.ev)) *
                               sqrt(list_dot_product(c.cv, c.cv))))*1000000
                              + 0.5) AS BIGINT) AS fs
                        FROM v, cent c),
             assign AS (SELECT vec_id, cent_id AS cell FROM (
                        SELECT *, row_number() OVER (PARTITION BY vec_id
                                  ORDER BY fs DESC, cent_id) AS rnk
                        FROM ascore) WHERE rnk = 1),
             probes AS (SELECT vec_id AS qid, cent_id AS cell FROM (
                        SELECT *, row_number() OVER (PARTITION BY vec_id
                                  ORDER BY fs DESC, cent_id) AS rnk
                        FROM ascore WHERE vec_id < 3)
                        WHERE rnk <= 2),
             scored AS (SELECT p.qid, a.vec_id AS cid, a.cell,
                               CAST(sum(l.ip) AS BIGINT) AS score
                        FROM probes p
                        JOIN assign a ON a.cell = p.cell
                        JOIN codes co ON co.vec_id = a.vec_id
                        JOIN lut l ON l.qid = p.qid AND l.m = co.m
                                  AND l.j = co.code
                        WHERE a.vec_id <> p.qid
                        GROUP BY 1, 2, 3)
             SELECT qid, cid, cell, score, rank FROM (
               SELECT *, row_number() OVER (PARTITION BY qid
                         ORDER BY score DESC, cid) AS rank FROM scored)
             WHERE rank <= 5""")
    ),

    // TF-IDF keyword extraction: exact fixed-point IDF, top-3 terms per
    // document via WindowGroupLimit. Oracle replays tf, df, the integer
    // idf credit and the (score desc, token) ranking.
    GraftQuery(
      "x_tfidf_keywords",
      (s, dir) =>
        TextAnalysis.tfidfKeywords(Tables.documents(s, dir),
          col("doc_id"), col("text"), k = 3),
      Some("""WITH toks AS (SELECT doc_id,
                      unnest(string_split(text, ' ')) AS token
               FROM documents),
             tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
                    FROM toks GROUP BY 1, 2),
             dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS dfc
                     FROM tf GROUP BY 1),
             n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents),
             sc AS (SELECT tf.doc_id, tf.token, tf.tf,
                     CAST(tf.tf * ((1000000 * (SELECT nn FROM n)) // dfq.dfc)
                       AS BIGINT) AS score
                    FROM tf JOIN dfq USING (token))
             SELECT doc_id, token, tf, score, rank FROM (
               SELECT *, row_number() OVER (PARTITION BY doc_id
                         ORDER BY score DESC, token) AS rank FROM sc)
             WHERE rank <= 3""")
    ),

    // Count-min sketch (Cormode & Muthukrishnan 2005): 4×1024 counters
    // built in one bounded-cardinality aggregate, probed map-only
    // against the literal sketch; the gate checks every estimate and
    // the one-sided bound (est >= exact) against exact counts.
    GraftQuery(
      "x_sketch_countmin",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val cms = graft.sketch.Sketches.countMinBuild(docs, col("text"))
        val probe = docs.filter(col("doc_id") < 5)
          .select(explode(split(col("text"), " ")).as("token"))
        graft.sketch.Sketches.countMinEstimate(docs, col("text"), probe, cms)
      },
      Some("""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok
                            FROM documents),
             rws AS (SELECT unnest(range(0, 4)) AS r),
             cms AS (SELECT r,
                      ('0x' || substr(md5(tok || '#' || CAST(r AS VARCHAR)),
                        1, 8))::BIGINT % 1024 AS b,
                      CAST(count(*) AS BIGINT) AS c
                     FROM toks, rws GROUP BY 1, 2),
             probe AS (SELECT DISTINCT unnest(string_split(text, ' '))
                         AS token
                       FROM documents WHERE doc_id < 5),
             tc AS (SELECT tok AS token, CAST(count(*) AS BIGINT)
                      AS true_cnt
                    FROM toks GROUP BY 1),
             est AS (SELECT p.token, CAST(min(c.c) AS BIGINT) AS est
                     FROM probe p
                     JOIN rws r2 ON TRUE
                     JOIN cms c ON c.r = r2.r AND c.b =
                       ('0x' || substr(md5(p.token || '#' ||
                          CAST(r2.r AS VARCHAR)), 1, 8))::BIGINT % 1024
                     GROUP BY 1)
             SELECT t.token, e.est, t.true_cnt,
                    e.est >= t.true_cnt AS ok
             FROM tc t JOIN est e USING (token)""")
    ),

    // HyperLogLog distinct sketch (Flajolet et al. 2007): 256 registers
    // over a bounded-cardinality aggregate; the integer-exact harmonic
    // estimator is replayed verbatim by the oracle, and `ok` asserts
    // the ±20% (≈3σ) accuracy bound against the exact count.
    GraftQuery(
      "x_sketch_hll",
      (s, dir) =>
        graft.sketch.Sketches.hllEstimate(Tables.lineitem(s, dir),
          col("l_orderkey")),
      Some("""WITH h AS (SELECT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),
                        1, 8))::BIGINT AS h FROM lineitem),
             r AS (SELECT h % 256 AS bucket,
                          CASE WHEN h // 256 = 0 THEN 25
                               ELSE 25 - length(bin(h // 256)) END AS rho
                   FROM h),
             regs AS (SELECT bucket, max(rho) AS register FROM r GROUP BY 1),
             agg AS (SELECT CAST(count(*) AS BIGINT) AS nb,
                            CAST(sum(1::BIGINT << (25 - register)) AS BIGINT)
                              AS s_present
                     FROM regs),
             ex AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT)
                      AS exact_cnt FROM lineitem),
             fin AS (SELECT nb,
                      s_present + (256 - nb) * (1::BIGINT << 25) AS s_scaled,
                      exact_cnt
                     FROM agg, ex),
             est AS (SELECT *,
                      (71827 * ((CAST(256 * 256 AS BIGINT) * (1::BIGINT << 25))
                        // s_scaled)) // 100000 AS est
                     FROM fin)
             SELECT 256 AS m, nb AS nonzero_buckets, s_scaled, est, exact_cnt,
                    abs(est - exact_cnt) * 5 <= exact_cnt AS ok
             FROM est""")
    ),

    // The sketch's production path in isolation: the register table
    // itself (≤ 256 rows), with no exact comparator anywhere — the
    // shape a 100 TB distinct-count actually runs (one scan, map-side
    // max, a 256-row shuffle). Yardstick twin of x_sketch_hll.
    GraftQuery(
      "x_sketch_hll_build",
      (s, dir) =>
        graft.sketch.Sketches.hllRegisters(Tables.lineitem(s, dir),
          col("l_orderkey")),
      Some("""WITH h AS (SELECT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),
                        1, 8))::BIGINT AS h FROM lineitem)
             SELECT h % 256 AS bucket,
                    CAST(max(CASE WHEN h // 256 = 0 THEN 25
                             ELSE 25 - length(bin(h // 256)) END) AS INT)
                      AS register
             FROM h GROUP BY 1""")
    ),

    // Language ID (stopword-hit heuristic).
    GraftQuery(
      "x_text_langid",
      (s, dir) =>
        Tables.documents(s, dir).select(
          col("doc_id"),
          TextAnalysis.enStopwordHits(col("text")).as("en_hits"),
          TextAnalysis.languageId(col("text")).as("pred_lang")),
      Some("""SELECT doc_id,
             len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is|it)\b')) AS en_hits,
             CASE WHEN len(regexp_extract_all(text,
               '\b(the|a|of|and|to|in|is|it)\b')) >= 2
               THEN 'en' ELSE 'other' END AS pred_lang
             FROM documents""")
    ),

    // Quality scoring (length/stopword/punct ratios, composite score).
    GraftQuery(
      "x_text_quality",
      (s, dir) =>
        TextAnalysis.quality(Tables.documents(s, dir), col("doc_id"), col("text")),
      Some("""WITH m AS (
               SELECT doc_id, length(text) AS n_chars,
                      len(string_split(text, ' ')) AS n_words,
                      len(regexp_extract_all(text,
                        '\b(the|a|of|and|to|in|is|it)\b')) AS n_stop,
                      len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
               FROM documents)
             SELECT doc_id, n_chars, n_words,
                    round(CAST(n_chars AS DOUBLE) / n_words, 3) AS avg_word_len,
                    round(CAST(n_stop AS DOUBLE) / n_words, 3) AS stopword_ratio,
                    n_punct,
                    round(least(1.0, CAST(n_words AS DOUBLE) / 50) * 0.5 +
                          least(1.0, CAST(n_stop AS DOUBLE) * 10 / n_words) * 0.5,
                          3) AS quality_score
             FROM m""")
    ),

    // Within-document repetition: duplicated-bigram fraction (the
    // Gopher-style boilerplate/degeneration signal). Map-only; the
    // oracle rebuilds the same bigrams with 1-based list indexing.
    GraftQuery(
      "x_text_repetition",
      (s, dir) =>
        TextAnalysis.repetitionRatio(Tables.documents(s, dir),
          col("doc_id"), col("text")),
      Some("""WITH b AS (
               SELECT doc_id,
                      list_transform(range(1, len(string_split(text, ' '))),
                        i -> string_split(text, ' ')[i] || ' ' ||
                             string_split(text, ' ')[i + 1]) AS bgs
               FROM documents)
             SELECT doc_id,
                    len(bgs) AS n_bigrams,
                    len(list_distinct(bgs)) AS n_distinct,
                    CASE WHEN len(bgs) > 0
                         THEN round(CAST(len(bgs) - len(list_distinct(bgs))
                                    AS DOUBLE) / len(bgs), 3)
                         ELSE 0.0 END AS repetition_ratio
             FROM b""")
    ),

    // PII detection + scrub: email/IPv4/phone patterns counted and
    // replaced by typed placeholders. PII is synthesized onto the text
    // identically on both sides so the counts are non-zero and the
    // replacement semantics (global, ordered) are gated — DuckDB's
    // regexp_replace needs the 'g' flag for parity with Spark's
    // replace-all.
    GraftQuery(
      "x_text_pii",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .withColumn("text", concat(col("text"),
            lit(" contact u"), col("doc_id").cast("string"),
            lit("@example.com from "),
            lit("10.0."), (col("doc_id") % 256).cast("string"), lit(".7"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" tel 555-01"), lpad((col("doc_id") % 10)
                .cast("string"), 1, "0"), lit("-"),
                lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
              .otherwise(lit(""))))
        TextAnalysis.piiScrub(docs, col("doc_id"), col("text"))
      },
      Some("""WITH aug AS (
               SELECT doc_id,
                      text || ' contact u' || CAST(doc_id AS VARCHAR) ||
                      '@example.com from 10.0.' ||
                      CAST(doc_id % 256 AS VARCHAR) || '.7' ||
                      CASE WHEN doc_id % 3 = 0
                           THEN ' tel 555-01' || CAST(doc_id % 10 AS VARCHAR)
                                || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR),
                                               4, '0')
                           ELSE '' END AS text
               FROM documents)
             SELECT doc_id,
                    len(regexp_extract_all(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                      AS n_email,
                    len(regexp_extract_all(text,
                      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
                      AS n_ip,
                    len(regexp_extract_all(text,
                      '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS n_phone,
                    regexp_replace(regexp_replace(regexp_replace(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                      '<EMAIL>', 'g'),
                      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                      '<IP>', 'g'),
                      '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g')
                      AS scrubbed
             FROM aug""")
    ),

    // Token counting: whitespace + BPE-ish regex segmentation.
    GraftQuery(
      "x_text_tokens",
      (s, dir) =>
        TextAnalysis.tokenCounts(Tables.documents(s, dir), col("doc_id"), col("text")),
      Some("""SELECT doc_id,
             len(string_split(text, ' ')) AS ws_tokens,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
               AS bpe_tokens
             FROM documents""")
    ),

    // Benchmark decontamination (GPT-3 appendix C / Pile style): corpus
    // docs sharing any word 13-gram with the benchmark partition
    // (doc_id % 20 == 0 stands in for the eval suite). The benchmark
    // n-gram set broadcasts; the corpus side never shuffles its grams.
    GraftQuery(
      "x_text_contamination",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        TextAnalysis.contamination(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0),
          col("doc_id"), col("text"))
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
                         FROM documents),
             ix AS (SELECT doc_id, w,
                           unnest(range(1, greatest(len(w) - 11, 1))) AS i
                    FROM d),
             g AS (SELECT doc_id, array_to_string(w[i:i+12], ' ') AS ngram
                   FROM ix),
             bench AS (SELECT DISTINCT ngram FROM g WHERE doc_id % 20 = 0),
             corpus AS (SELECT DISTINCT doc_id, ngram FROM g
                        WHERE doc_id % 20 != 0)
             SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
             FROM corpus JOIN bench USING (ngram) GROUP BY 1""")
    ),

    // Bloom-filter decontamination (the scale path of
    // x_text_contamination): same bench/corpus partition, but the
    // corpus side probes a 2^18-bit k=3 Bloom bitset map-only. The
    // oracle replays the identical md5 bit math, so even Bloom false
    // positives hash-match.
    GraftQuery(
      "x_contamination_bloom",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        TextAnalysis.contaminationBloom(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0),
          col("doc_id"), col("text"))
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
                         FROM documents),
             ix AS (SELECT doc_id, w,
                           unnest(range(1, greatest(len(w) - 11, 1))) AS i
                    FROM d),
             g AS (SELECT DISTINCT doc_id,
                          array_to_string(w[i:i+12], ' ') AS ngram FROM ix),
             bench AS (SELECT DISTINCT ngram FROM g WHERE doc_id % 20 = 0),
             bloom AS (SELECT DISTINCT
                         ('0x' || substr(md5(ngram || '#' || j.j), 1, 8))
                           ::BIGINT % 262144 AS bit
                       FROM bench, (SELECT unnest([1, 2, 3]) AS j) j),
             corpus AS (SELECT DISTINCT doc_id, ngram FROM g
                        WHERE doc_id % 20 != 0),
             probe AS (SELECT doc_id, ngram,
                         ('0x' || substr(md5(ngram || '#1'), 1, 8))
                           ::BIGINT % 262144 AS b1,
                         ('0x' || substr(md5(ngram || '#2'), 1, 8))
                           ::BIGINT % 262144 AS b2,
                         ('0x' || substr(md5(ngram || '#3'), 1, 8))
                           ::BIGINT % 262144 AS b3
                       FROM corpus),
             hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_flagged
                      FROM probe
                      WHERE b1 IN (SELECT bit FROM bloom)
                        AND b2 IN (SELECT bit FROM bloom)
                        AND b3 IN (SELECT bit FROM bloom)
                      GROUP BY 1),
             base AS (SELECT dd.doc_id,
                        CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_grams
                      FROM (SELECT doc_id FROM documents
                            WHERE doc_id % 20 != 0) dd
                      LEFT JOIN (SELECT doc_id, count(*) AS n FROM corpus
                                 GROUP BY 1) cnt USING (doc_id))
             SELECT base.doc_id, base.n_grams,
                    CAST(coalesce(hits.n_flagged, 0) AS BIGINT) AS n_flagged,
                    CASE WHEN coalesce(hits.n_flagged, 0) > 0 THEN 1 ELSE 0 END
                      AS contaminated
             FROM base LEFT JOIN hits USING (doc_id)""")
    ),

    // Corpus-duplicated n-gram fraction (the Gopher repetition rule
    // measured across documents): per doc, what share of its distinct
    // 13-grams appear in any other document.
    GraftQuery(
      "x_text_dupgrams",
      (s, dir) =>
        TextAnalysis.dupNgramFraction(Tables.documents(s, dir),
          col("doc_id"), col("text")),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
                         FROM documents),
             ix AS (SELECT doc_id, w,
                           unnest(range(1, greatest(len(w) - 11, 1))) AS i
                    FROM d),
             g AS (SELECT DISTINCT doc_id,
                          array_to_string(w[i:i+12], ' ') AS ngram FROM ix),
             c AS (SELECT ngram, count(*) AS nd FROM g GROUP BY 1),
             a AS (SELECT g.doc_id, count(*) AS n_grams,
                          CAST(sum(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END)
                               AS BIGINT) AS n_dup
                   FROM g JOIN c USING (ngram) GROUP BY 1)
             SELECT doc.doc_id,
                    coalesce(a.n_grams, 0) AS n_grams,
                    coalesce(a.n_dup, 0) AS n_dup,
                    coalesce(round(CAST(a.n_dup AS DOUBLE) / a.n_grams, 3),
                             0.0) AS dup_frac
             FROM documents doc LEFT JOIN a USING (doc_id)""")
    ),

    // Hashed bag-of-tokens linear scorer (fasttext-shaped classifier
    // filtering): exact integer weight sum folded over the token array
    // — one map-only projection, no explode, no shuffle.
    GraftQuery(
      "x_quality_classifier",
      (s, dir) =>
        TextAnalysis.classifierScore(Tables.documents(s, dir),
          col("doc_id"), col("text")),
      Some("""WITH t AS (SELECT doc_id,
                                unnest(string_split(text, ' ')) AS tok
                         FROM documents),
             a AS (SELECT doc_id,
                          CAST(sum(('0x' || substr(md5(tok), 1, 8))::BIGINT
                                   % 1001 - 500) AS BIGINT) AS score_sum
                   FROM t GROUP BY 1)
             SELECT d.doc_id,
                    CAST(len(string_split(d.text, ' ')) AS BIGINT)
                      AS n_tokens,
                    a.score_sum,
                    CASE WHEN a.score_sum > 0 THEN 'keep' ELSE 'drop' END
                      AS label
             FROM documents d JOIN a USING (doc_id)""")
    ),

    // Cross-document paragraph dedup (RefinedWeb/CCNet pass) over
    // fixed 20-token windows: corpus-wide occurrence counts on
    // md5(chunk), duplicated chunks dropped, survivors reassembled in
    // order.
    GraftQuery(
      "x_dedup_paragraph",
      (s, dir) =>
        graft.dedup.Dedup.chunkDedup(Tables.documents(s, dir),
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
             c AS (SELECT chunk, count(*) AS n FROM p GROUP BY 1)
             SELECT p.doc_id,
                    CAST(count(*) AS BIGINT) AS n_chunks,
                    CAST(sum(CASE WHEN c.n > 1 THEN 1 ELSE 0 END)
                         AS BIGINT) AS n_dup,
                    coalesce(string_agg(CASE WHEN c.n = 1 THEN p.chunk END,
                                        ' ' ORDER BY p.i), '') AS cleaned
             FROM p JOIN c USING (chunk) GROUP BY 1""")
    ),

    // Document fingerprint (position-weighted rolling hash).
    GraftQuery(
      "x_text_fingerprint",
      (s, dir) =>
        TextAnalysis.fingerprint(Tables.documents(s, dir), col("doc_id"), col("text")),
      Some("""WITH toks AS (
               SELECT doc_id,
                      unnest(string_split(text, ' ')) AS tok,
                      unnest(range(0, len(string_split(text, ' ')))) AS pos
               FROM documents)
             SELECT doc_id,
                    CAST(sum((ascii(substr(md5(tok), 1, 1)) * 256 +
                         ascii(substr(md5(tok), 2, 1))) * (1 + pos % 97))
                      % 1000000007 AS BIGINT) AS fingerprint
             FROM toks GROUP BY doc_id""")
    ),

    // Corpus-wide top-k bigram census (vocabulary/boilerplate scan):
    // codegen shingles → HashAggregate → TakeOrderedAndProject; oracle
    // rebuilds bigrams with a lead() window and replays the total order.
    GraftQuery(
      "x_text_ngrams",
      (s, dir) =>
        TextAnalysis.topNgrams(Tables.documents(s, dir), col("text"),
          n = 2, k = 50),
      Some("""WITH toks AS (
               SELECT doc_id,
                      unnest(string_split(text, ' ')) AS tok,
                      unnest(range(0, len(string_split(text, ' ')))) AS pos
               FROM documents),
             g AS (
               SELECT tok || ' ' || lead(tok) OVER
                        (PARTITION BY doc_id ORDER BY pos) AS ngram
               FROM toks),
             c AS (SELECT ngram, CAST(count(*) AS BIGINT) AS cnt
                   FROM g WHERE ngram IS NOT NULL GROUP BY 1)
             SELECT ngram, cnt FROM c ORDER BY cnt DESC, ngram LIMIT 50""")
    ),

    // Deterministic train/val/test split on a stable id hash (survives
    // reshuffles/retries/corpus growth; never position-derived).
    GraftQuery(
      "x_split_hash",
      (s, dir) =>
        TextAnalysis.hashSplit(Tables.documents(s, dir), col("doc_id")),
      Some("""SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  % 10 AS INT) AS bucket,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 10 <= 7 THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 10 = 8 THEN 'val'
                  ELSE 'test' END AS split
             FROM documents""")
    ),

    // Multimodal plumbing: opaque binary payload + deterministic
    // metadata (decode stub exercised in MultimodalSpec).
    GraftQuery(
      "x_multimodal_ingest",
      (s, dir) =>
        graft.multimodal.Multimodal.ingest(
          Tables.documents(s, dir), "doc_id", "text", "text/plain")
          .select(col("media_id"), col("kind"), col("size_bytes"),
            sha2(col("payload"), 256).as("payload_sha")),
      Some("""SELECT doc_id AS media_id, 'text/plain' AS kind,
             octet_length(encode(text)) AS size_bytes,
             sha256(text) AS payload_sha
             FROM documents""")
    ),

    // Video-style frame sampling over opaque binary payloads: every-4th
    // 16-byte slice as a "frame", pure codegen expressions (sequence /
    // transform / binary substring — no UDF). Frames are emitted as
    // sha-256 so the gate compares content, not array encodings.
    GraftQuery(
      "x_multimodal_framesample",
      (s, dir) => {
        val media = graft.multimodal.Multimodal.ingest(
          Tables.documents(s, dir), "doc_id", "text", "text/plain")
        graft.multimodal.Multimodal.frameSample(media,
          frameBytes = 16, everyN = 4)
          .select(col("media_id"),
            posexplode(col("frames")).as(Seq("frame_no", "frame")))
          .select(col("media_id"),
            col("frame_no").cast("long").as("frame_no"),
            sha2(col("frame"), 256).as("frame_sha"))
      },
      Some("""WITH f AS (SELECT doc_id, text,
                    unnest(range(0, octet_length(encode(text)) // 64 + 1))
                      AS i
               FROM documents)
             SELECT doc_id AS media_id, CAST(i AS BIGINT) AS frame_no,
                    sha256(substring(text, CAST(i*64 + 1 AS INT), 16))
                      AS frame_sha
             FROM f""")
    ),

    // Feature extraction through the mapPartitions decode path (the
    // real-codec plumbing: repartition by id, per-partition batch loop,
    // deterministic stub decoder). Gated on the exact byte statistics
    // the decode loop computes; the float feature vector stays
    // spec-level (float accumulation is not hash-replayable).
    GraftQuery(
      "x_multimodal_features",
      (s, dir) => {
        val media = graft.multimodal.Multimodal.ingest(
          Tables.documents(s, dir), "doc_id", "text", "text/plain")
        graft.multimodal.Multimodal.extractFeatures(s, media)
          .toDF().select(col("media_id"), col("size_bytes"), col("mean_byte"))
      },
      Some("""WITH b AS (SELECT doc_id,
                    CAST(octet_length(encode(text)) AS BIGINT) AS n,
                    list_sum(list_transform(range(1, length(text) + 1),
                      i -> ascii(text[i:i]))) AS s
               FROM documents)
             SELECT doc_id AS media_id, n AS size_bytes,
                    CASE WHEN n = 0 THEN 0.0
                         ELSE CAST(s AS DOUBLE) / n END AS mean_byte
             FROM b""")
    ),

    // Image header sniffing without codecs (MediaHeader codegen
    // expression): real PNG/JPEG/GIF/BMP container headers are
    // synthesized byte-exact from `documents` values (big/little-endian
    // dimension fields per format spec, JPEG behind an APP0 segment the
    // scanner must skip; every 17th payload is a non-container that must
    // sniff NULL), then parsed back by magic bytes. The oracle
    // recomputes format/width/height straight from the table, gating the
    // build→sniff round trip.
    GraftQuery(
      "x_multimodal_headers",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val w = (col("doc_id") % 1920 + 16).cast("bigint")
        val h = (col("doc_id") % 1080 + 16).cast("bigint")
        def be32(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 8, "0"))
        def be16(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 4, "0"))
        def le16(c: org.apache.spark.sql.Column) = {
          val x = lpad(hex(c), 4, "0")
          unhex(concat(substring(x, 3, 2), substring(x, 1, 2)))
        }
        def le32(c: org.apache.spark.sql.Column) = {
          val x = lpad(hex(c), 8, "0")
          unhex(concat(substring(x, 7, 2), substring(x, 5, 2),
            substring(x, 3, 2), substring(x, 1, 2)))
        }
        val junk = substring(col("text").cast("binary"), 1, 32)
        val png = concat(unhex(lit("89504E470D0A1A0A")),
          unhex(lit("0000000D49484452")), be32(w), be32(h),
          unhex(lit("0806000000")), junk)
        val jpeg = concat(unhex(lit("FFD8")),
          unhex(lit("FFE00010")), unhex(repeat(lit("00"), 14)), // APP0 to skip
          unhex(lit("FFC00011")), unhex(lit("08")), be16(h), be16(w), junk)
        val gif = concat(lit("GIF89a").cast("binary"), le16(w), le16(h), junk)
        val bmp = concat(lit("BM").cast("binary"),
          unhex(repeat(lit("00"), 12)), unhex(lit("28000000")),
          le32(w), le32(h), junk)
        // NUL-prefixed so a text fragment can never alias a magic number
        val payload = when(col("doc_id") % 17 === 0, concat(unhex(lit("00")), junk))
          .when(col("doc_id") % 4 === 0, png)
          .when(col("doc_id") % 4 === 1, jpeg)
          .when(col("doc_id") % 4 === 2, gif)
          .otherwise(bmp)
        docs.select(col("doc_id").as("media_id"),
            graft.functions.MediaFunctions.mediaHeader(payload).as("__m"))
          .select(col("media_id"), col("__m.format").as("format"),
            col("__m.width").as("width"), col("__m.height").as("height"))
      },
      Some("""SELECT doc_id AS media_id,
             CASE WHEN doc_id % 17 = 0 THEN NULL
                  WHEN doc_id % 4 = 0 THEN 'png'
                  WHEN doc_id % 4 = 1 THEN 'jpeg'
                  WHEN doc_id % 4 = 2 THEN 'gif'
                  ELSE 'bmp' END AS format,
             CASE WHEN doc_id % 17 = 0 THEN NULL
                  ELSE CAST(doc_id % 1920 + 16 AS INT) END AS width,
             CASE WHEN doc_id % 17 = 0 THEN NULL
                  ELSE CAST(doc_id % 1080 + 16 AS INT) END AS height
             FROM documents""")
    ),

    // Dedup clustering: SimHash near-dup pairs → connected components
    // (alternating large-star/small-star) → one cluster id + canonical
    // flag per document. The oracle recomputes the same pairs and closes
    // them transitively with a recursive CTE, so the whole
    // pairs→components→canonical pipeline is gated, not just the pair
    // stage. Cluster id = min doc_id of the component (deterministic in
    // both engines).
    GraftQuery(
      "x_dedup_cc",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.simhashPairs16(
          Dedup.simhash16(docs, col("doc_id"), col("text")), maxHamming = 1)
        graft.dedup.Components.clusters(
          docs, col("doc_id"), pairs, "doc_a", "doc_b")
      },
      Some(CcCtes + """
           SELECT id AS doc_id, component,
                  CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
                    AS cluster_size,
                  id = component AS is_canonical
           FROM comp""")
    ),

    // Corpus curation — the composition every LLM training pipeline
    // runs end-to-end: near-dup clustering (simhash → connected
    // components) + language ID + quality score + deterministic split,
    // keeping one canonical English document per cluster above the
    // quality floor. The oracle composes the same four replays and
    // re-derives the keep set independently, gating the whole
    // curation pipeline, not its stages.
    GraftQuery(
      "x_corpus_curate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.simhashPairs16(
          Dedup.simhash16(docs, col("doc_id"), col("text")), maxHamming = 1)
        // ONE per-doc feature pass fused into the cluster-assignment
        // scan (r17, guide §1.2 "don't compute things twice" / §2.3
        // "project before the exchange"): quality + language + split are
        // all map-only column expressions over the same rows, so they
        // ride the docs side of the component join instead of three
        // separate documents scans re-joined on doc_id afterwards
        // (before: 4 scans of documents, 3 broadcast joins; the result
        // set is unchanged — same expressions, same filter).
        val feats = docs.select(col("doc_id").cast("long").as("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("quality_score"),
          TextAnalysis.languageId(col("text")).as("pred_lang"),
          TextAnalysis.splitOf(col("doc_id")).as("split"))
        graft.dedup.Components.clustersKeeping(feats, pairs,
            "doc_a", "doc_b")
          .filter(col("is_canonical") && col("pred_lang") === "en" &&
            col("quality_score") >= 0.5)
          .select(col("doc_id"), col("component"), col("cluster_size"),
            col("quality_score"), col("split"))
      },
      Some(CcCtes + """,
           cl AS (SELECT id AS doc_id, component,
                  CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
                    AS cluster_size,
                  id = component AS is_canonical
                  FROM comp),
           q AS (SELECT doc_id,
                 round(least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE)
                             / 50) * 0.5 +
                       least(1.0, CAST(len(regexp_extract_all(text,
                             '\b(the|a|of|and|to|in|is|it)\b')) AS DOUBLE)
                             * 10 / len(string_split(text, ' '))) * 0.5,
                       3) AS quality_score
                 FROM documents),
           l AS (SELECT doc_id,
                 CASE WHEN len(regexp_extract_all(text,
                   '\b(the|a|of|and|to|in|is|it)\b')) >= 2
                   THEN 'en' ELSE 'other' END AS pred_lang
                 FROM documents),
           sp AS (SELECT doc_id,
                  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                            % 10 <= 7 THEN 'train'
                       WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                            % 10 = 8 THEN 'val'
                       ELSE 'test' END AS split
                  FROM documents)
           SELECT cl.doc_id, cl.component, cl.cluster_size,
                  q.quality_score, sp.split
           FROM cl JOIN q USING (doc_id) JOIN l USING (doc_id)
                   JOIN sp USING (doc_id)
           WHERE cl.is_canonical AND l.pred_lang = 'en'
             AND q.quality_score >= 0.5""")
    ),

    // Sessionization over the event stream (beyond the reference's
    // tumbling/hopping windows — the standard event-analytics /
    // training-data shape): Spark's native session_window with a
    // 30-minute gap, one shuffle on (user, session). A new session
    // starts when the inter-event gap is >= the timeout (Spark's
    // session end bound is exclusive); the oracle mirrors that with a
    // gaps-and-islands cumulative sum.
    GraftQuery(
      "x_sessionize",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        ev.groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(28,6)")).cast("double").as("value_sum"))
          .select(col("user_id"),
            unix_micros(col("sw.start")).as("session_start"),
            unix_micros(col("sw.end")).as("session_end"),
            col("n_events"), col("value_sum"))
      },
      Some("""WITH x AS (
               SELECT user_id, ts, value,
                      CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END AS new_s
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             y AS (
               SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
               FROM x)
             SELECT user_id,
                    epoch_us(min(ts)) AS session_start,
                    epoch_us(max(ts)) + 1800000000 AS session_end,
                    CAST(count(*) AS BIGINT) AS n_events,
                    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum
             FROM y GROUP BY user_id, sid""")
    ),

    // As-of join (backward, inclusive): each click joins the user's
    // most recent purchase at or before it — the merge-asof pattern
    // (union + one keyed window, NO join node, no range explode; a
    // skewed user costs one sort, not a quadratic probe). Oracle is
    // DuckDB's native ASOF LEFT JOIN.
    GraftQuery(
      "x_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("ts").as("purchase_ts"),
            col("value").as("purchase_value"))
        graft.ops.AsofJoin.asofBackward(clicks, purchases,
            key = "user_id", ts = "ts",
            payload = Seq("purchase_ts", "purchase_value"))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("click_us"),
            unix_micros(col("purchase_ts")).as("purchase_us"),
            col("purchase_value"))
      },
      Some("""WITH c AS (SELECT event_id, user_id, ts FROM events
                         WHERE event_type = 'click'),
             p AS (SELECT user_id, ts, value FROM events
                   WHERE event_type = 'purchase')
             SELECT c.event_id, c.user_id,
                    epoch_us(c.ts) AS click_us,
                    epoch_us(p.ts) AS purchase_us,
                    p.value AS purchase_value
             FROM c ASOF LEFT JOIN p
               ON c.user_id = p.user_id AND c.ts >= p.ts""")
    ),

    // TSDB-style OHLC rollup: the raw metric stream compacts to
    // per-(series, minute) open/high/low/close/sum rows — one
    // epoch-aligned window aggregate, partials combine map-side, the
    // shuffle carries one row per (series, bucket, partition) at any
    // point volume. First/last by a total-order (ts, id) key,
    // replayable as DuckDB arg_min/arg_max.
    GraftQuery(
      "x_series_ohlc",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        graft.ops.OhlcDownsample(ev, col("event_type"), col("ts"),
          col("event_id"), col("value"))
      },
      Some("""WITH e AS (SELECT event_type AS k,
                     (epoch_us(ts) // 60000000) * 60000000 AS bucket_us,
                     value,
                     lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
                     lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord
                   FROM events)
             SELECT k, bucket_us,
                    arg_min(value, ord) AS open,
                    max(value) AS high,
                    min(value) AS low,
                    arg_max(value, ord) AS close,
                    CAST(count(*) AS BIGINT) AS n_points,
                    CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                      AS value_sum
             FROM e GROUP BY 1, 2""")
    ),

    // Interval join: every purchase within 6 hours BEFORE each click of
    // the same user — key equality keeps the plan an equi-join with the
    // range as a filter (plan-pinned: no cartesian/BNLJ); the streaming
    // twin is the watermarked stream-stream join where the same bound
    // is the state-retention bound.
    GraftQuery(
      "x_interval_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts").as("cts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("pts"),
            col("value").as("purchase_value"))
        graft.ops.AsofJoin.intervalJoin(clicks, purchases,
            col("user_id"), col("p_user"), col("cts"), col("pts"),
            "6 HOURS")
          .select(col("click_id"), col("user_id"),
            unix_micros(col("cts")).as("click_us"),
            unix_micros(col("pts")).as("purchase_us"),
            col("purchase_value"))
      },
      Some("""WITH c AS (SELECT event_id AS click_id, user_id, ts AS cts
                   FROM events WHERE event_type = 'click'),
             p AS (SELECT user_id AS p_user, ts AS pts,
                     value AS purchase_value
                   FROM events WHERE event_type = 'purchase')
             SELECT click_id, user_id, epoch_us(cts) AS click_us,
                    epoch_us(pts) AS purchase_us, purchase_value
             FROM c JOIN p ON user_id = p_user
               AND pts <= cts AND pts >= cts - INTERVAL 6 HOUR""")
    ),

    // SemDeDup-style semantic dedup: k-means clusters the embedding
    // space, pairwise cosine runs only WITHIN a cluster, and a vector
    // is a duplicate when a lower-id cluster-mate is within the cosine
    // threshold. The synthetic embeddings carry no planted near-dups
    // (max pairwise cosine ≈0.51), so the gate threshold is 0.4 — the
    // mechanism under test, not the production ε.
    GraftQuery(
      "x_dedup_semantic",
      (s, dir) =>
        Similarity.semDedup(Tables.embeddings(s, dir), "vec_id",
          "embedding", k = 8, iters = 2, dim = 64, threshold = 0.4),
      Some(semDedupOracle(k = 8, dim = 64, threshold = 0.4))
    ),

    // The k-SCALABLE SemDeDup twin: identical pipeline with training
    // argmax + assignment through the NearestCell codegen kernel
    // (centroid matrix = ONE codegen reference object) instead of the
    // k-struct literal expression tree, whose plan grows O(k·dim) and
    // falls out of whole-stage codegen past a few dozen centroids.
    // Production SemDeDup runs thousands of cells (11k for LAION) —
    // growing k is what shrinks the (n/k)² cell bound, so this path IS
    // the 100 TB path, and k here is ADAPTIVE: both engines derive
    // k = clamp(n/2000, 8, 4096) from the corpus itself (≈2000-vector
    // cells at every scale — the gate text is scale-invariant, k=8 at
    // the verify scales, 1000 cells at the 2M-vector decade). Only the
    // assignment tie/rounding semantics differ from the literal twin
    // (fixed-point floor, the IVF kernels' contract), and the oracle
    // replays that formula.
    GraftQuery(
      "x_dedup_semantic_scaled",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val k = math.max(8L, math.min(4096L, emb.count() / 2000L)).toInt
        Similarity.semDedupScaled(emb, "vec_id",
          "embedding", k = k, iters = 2, dim = 64, threshold = 0.4)
      },
      Some(semDedupOracleScaled(
        kSql = "(SELECT greatest(8, least(4096, count(*)//2000)) FROM v)",
        dim = 64, threshold = 0.4))
    ),

    // DSIR-style importance weighting: hashed-bigram count tables for
    // the target (doc_id%20==0, the same stand-in eval suite the
    // contamination gate uses) and raw distributions become literal
    // model state; scoring the raw corpus is map-only. Scores are
    // exact integers; the keep label cross-multiplies mass ratios.
    GraftQuery(
      "x_dsir_weights",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        TextAnalysis.dsirWeights(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0),
          col("doc_id"), col("text"))
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
                         FROM documents),
             ix AS (SELECT doc_id, w,
                           unnest(range(1, greatest(len(w), 1))) AS i
                    FROM d),
             g AS (SELECT doc_id,
                          ('0x' || substr(md5(array_to_string(w[i:i+1], ' ')),
                                          1, 8))::BIGINT % 4096 AS b
                   FROM ix),
             tc AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM g
                    WHERE doc_id % 20 = 0 GROUP BY 1),
             rc AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM g
                    WHERE doc_id % 20 != 0 GROUP BY 1),
             tot AS (SELECT (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM tc) AS t,
                            (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM rc) AS r),
             s AS (SELECT g.doc_id,
                          CAST(count(*) AS BIGINT) AS n_grams,
                          CAST(coalesce(sum(tc.n), 0) AS BIGINT) AS score_t,
                          CAST(coalesce(sum(rc.n), 0) AS BIGINT) AS score_r
                   FROM g LEFT JOIN tc USING (b) LEFT JOIN rc USING (b)
                   WHERE g.doc_id % 20 != 0 GROUP BY 1)
             SELECT d.doc_id,
                    coalesce(s.n_grams, 0) AS n_grams,
                    coalesce(s.score_t, 0) AS score_t,
                    coalesce(s.score_r, 0) AS score_r,
                    CASE WHEN coalesce(s.score_t, 0)::HUGEINT * tot.r >
                              coalesce(s.score_r, 0)::HUGEINT * tot.t
                         THEN 'keep' ELSE 'drop' END AS label
             FROM d CROSS JOIN tot LEFT JOIN s ON s.doc_id = d.doc_id
             WHERE d.doc_id % 20 != 0""")
    ),

    // Trained hashed naive-Bayes classifier (fastText-shaped): per-class
    // hashed-unigram count tables trained on the corpus's own labels
    // (lang = 'en' vs rest) collapse to fixed-point Bayes posteriors
    // P(pos|token); scoring is a map-only fold against the one literal
    // array, decision = average posterior above 1/2. Oracle retrains
    // the tables and replays posterior, prior and comparison in
    // HUGEINT. (On this synthetic corpus all languages share one
    // vocabulary, so the model is honest about finding ~no signal —
    // the unit spec shows it learning on separable data.)
    GraftQuery(
      "x_nb_classifier",
      (s, dir) =>
        TextAnalysis.nbClassifier(Tables.documents(s, dir),
          col("doc_id"), col("text"), col("lang") === "en",
          posName = "en", negName = "other"),
      Some("""WITH t AS (SELECT doc_id, lang,
                      unnest(string_split(text, ' ')) AS tok
               FROM documents),
             g AS (SELECT doc_id, lang,
                      ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS b
                   FROM t),
             cb AS (SELECT b,
                    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                      AS BIGINT) AS cp,
                    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
                      AS BIGINT) AS cn
                    FROM g GROUP BY 1),
             tot AS (SELECT CAST(coalesce(sum(cp), 0) AS BIGINT) + 1024 AS tp,
                            CAST(coalesce(sum(cn), 0) AS BIGINT) + 1024 AS tn
                     FROM cb),
             post AS (SELECT b,
                      CAST((1000000::HUGEINT * ((cp+1)::HUGEINT * (SELECT tn FROM tot))) //
                           ((cp+1)::HUGEINT * (SELECT tn FROM tot) +
                            (cn+1)::HUGEINT * (SELECT tp FROM tot)) AS BIGINT) AS p
                      FROM cb),
             nd AS (SELECT CAST(count(*) AS BIGINT) AS n,
                           CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                             AS BIGINT) AS np
                    FROM documents),
             pr AS (SELECT CAST((1000000*(np+1)) // (n+2) AS BIGINT) AS pp
                    FROM nd),
             sc AS (SELECT g.doc_id,
                    CAST(sum(post.p) AS BIGINT) AS sw
                    FROM g JOIN post USING (b) GROUP BY 1)
             SELECT d.doc_id,
                    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
                    CAST((SELECT pp FROM pr) + sc.sw AS BIGINT) AS score_pos,
                    CAST(1000000*(len(string_split(d.text, ' ')) + 1) -
                         ((SELECT pp FROM pr) + sc.sw) AS BIGINT) AS score_neg,
                    CASE WHEN 2*((SELECT pp FROM pr) + sc.sw) >
                              1000000*(len(string_split(d.text, ' ')) + 1)
                         THEN 'en' ELSE 'other' END AS pred
             FROM documents d JOIN sc ON d.doc_id = sc.doc_id""")
    ),

    // C4/RefinedWeb-style per-domain quota: at most 20 docs per
    // `source` domain, hash-priority order, kept rows only (the window
    // collapses to a partial+final WindowGroupLimit — bounded state on
    // every hot domain).
    GraftQuery(
      "x_curate_domains",
      (s, dir) =>
        TextAnalysis.domainQuota(Tables.documents(s, dir),
          col("doc_id"), col("source"), cap = 20),
      Some("""SELECT doc_id, domain, rn FROM (
               SELECT doc_id, source AS domain,
                      row_number() OVER (PARTITION BY source
                        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
               FROM documents)
             WHERE rn <= 20""")
    ),

    // Token-budget data mixing: every language gets the same token
    // budget, filled in deterministic hash-priority order; emits every
    // doc with its running total and keep flag (auditable exclusion,
    // no silent truncation).
    GraftQuery(
      "x_mix_budget",
      (s, dir) =>
        TextAnalysis.tokenBudgetMix(Tables.documents(s, dir),
          col("doc_id"), col("lang"), col("text"), budgetPerGroup = 4000L),
      Some("""SELECT doc_id, grp, n_tokens,
                    CAST(cum_tokens AS BIGINT) AS cum_tokens,
                    CASE WHEN cum_tokens <= 4000 THEN 1 ELSE 0 END AS kept
             FROM (
               SELECT doc_id, lang AS grp,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                      sum(len(string_split(text, ' ')))
                        OVER (PARTITION BY lang
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum_tokens
               FROM documents)""")
    ),

    // C4-style line cleaning: the synthetic docs are single-line, so
    // the query derives a deterministic line structure both engines
    // replay — ' table '→'.\n' and ' row '→'?\n' make punctuated line
    // breaks, ' scan '→'\n' makes unpunctuated ones, and three modular
    // doc_id classes inject the javascript / lorem-ipsum / brace
    // triggers. The operator under test is the line filter + doc gate.
    GraftQuery(
      "x_text_c4_clean",
      (s, dir) => {
        val nl = "\n"
        val docs = Tables.documents(s, dir)
          .withColumn("t1", when(col("doc_id") % 83 === 0,
            concat(col("text"), lit(nl + "this uses javascript today.")))
            .otherwise(col("text")))
          .withColumn("t2", when(col("doc_id") % 97 === 0,
            concat(col("t1"), lit(" lorem ipsum"))).otherwise(col("t1")))
          .withColumn("t3", when(col("doc_id") % 89 === 0,
            concat(col("t2"), lit(" {"))).otherwise(col("t2")))
          .withColumn("lined",
            regexp_replace(regexp_replace(regexp_replace(col("t3"),
              lit(" table "), lit("." + nl)),
              lit(" row "), lit("?" + nl)),
              lit(" scan "), lit(nl)))
        TextAnalysis.c4LineClean(docs, col("doc_id"), col("lined"))
      },
      Some("""WITH t AS (
               SELECT doc_id,
                      replace(replace(replace(
                        CASE WHEN doc_id % 89 = 0 THEN t2 || ' {' ELSE t2 END,
                        ' table ', '.' || chr(10)),
                        ' row ', '?' || chr(10)),
                        ' scan ', chr(10)) AS lined
               FROM (SELECT doc_id,
                       CASE WHEN doc_id % 97 = 0 THEN t1 || ' lorem ipsum'
                            ELSE t1 END AS t2
                     FROM (SELECT doc_id,
                             CASE WHEN doc_id % 83 = 0
                                  THEN text || chr(10) || 'this uses javascript today.'
                                  ELSE text END AS t1
                           FROM documents))),
             k AS (
               SELECT doc_id, lined,
                      list_filter(string_split(lined, chr(10)),
                        x -> regexp_matches(x, '[.!?"]$')
                             AND len(string_split(x, ' ')) >= 3
                             AND NOT contains(lower(x), 'javascript')) AS kept
               FROM t),
             c AS (
               -- array_to_string of an empty list is NULL in DuckDB;
               -- Spark's array_join returns '' — normalize to ''
               SELECT doc_id, lined, kept,
                      coalesce(array_to_string(kept, chr(10)), '') AS cleaned
               FROM k)
             SELECT doc_id,
                    len(string_split(lined, chr(10))) AS n_lines,
                    len(kept) AS n_kept,
                    cleaned,
                    len(regexp_extract_all(cleaned, '[.!?]')) AS n_sentences,
                    CASE WHEN len(regexp_extract_all(cleaned, '[.!?]')) >= 5
                              AND NOT contains(lower(lined), 'lorem ipsum')
                              AND NOT contains(lower(lined), '{')
                         THEN 'keep' ELSE 'drop' END AS label
             FROM c""")
    ),

    // Gopher document-quality rules with exact-integer cross-multiplied
    // ratio tests. The stop list is vocabulary-adapted (the synthetic
    // corpus lacks of/and/that/have/with) so both labels occur; the
    // rule structure is Rae et al. A1.1 verbatim.
    GraftQuery(
      "x_text_gopher",
      (s, dir) =>
        TextAnalysis.gopherRules(Tables.documents(s, dir),
          col("doc_id"), col("text"),
          stops = Seq("the", "a", "data", "table", "row", "line", "key",
            "value")),
      Some("""SELECT doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                    CAST(list_sum(list_transform(string_split(text, ' '),
                        x -> len(x))) AS BIGINT) AS sum_word_len,
                    CAST(len(list_filter(string_split(text, ' '),
                        x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
                      AS n_alpha_words,
                    CAST(len(regexp_extract_all(text, '#'))
                       + len(regexp_extract_all(text, '\.\.\.|…')) AS BIGINT)
                      AS n_symbols,
                    CAST(len(list_filter(
                        ['the','a','data','table','row','line','key','value'],
                        s -> list_contains(string_split(text, ' '), s)))
                      AS BIGINT) AS n_stop_kinds,
                    CASE WHEN len(string_split(text, ' ')) BETWEEN 50 AND 100000
                              AND list_sum(list_transform(string_split(text, ' '),
                                  x -> len(x)))
                                  BETWEEN 3 * len(string_split(text, ' '))
                                      AND 10 * len(string_split(text, ' '))
                              AND 10 * (len(regexp_extract_all(text, '#'))
                                   + len(regexp_extract_all(text, '\.\.\.|…')))
                                  <= len(string_split(text, ' '))
                              AND 5 * len(list_filter(string_split(text, ' '),
                                  x -> regexp_matches(x, '[A-Za-z]')))
                                  >= 4 * len(string_split(text, ' '))
                              AND len(list_filter(
                                  ['the','a','data','table','row','line','key','value'],
                                  s -> list_contains(string_split(text, ' '), s))) >= 2
                         THEN 'keep' ELSE 'drop' END AS label
             FROM documents""")
    ),

    // WARC/WET ingest (ISO 28500 — the Common Crawl container every
    // large-scale pipeline starts from). The query builds real WET
    // segments from `documents` (a warcinfo head record + one
    // Content-Length-framed conversion record per doc, CRLF framing,
    // octet lengths), then the operator under test — the codegen
    // WarcScan single-pass scanner — parses them back. The oracle
    // recomputes the flat truth from the original columns, so framing
    // AND parsing must both be right for the hash to match.
    GraftQuery(
      "x_warc_ingest",
      (s, dir) => {
        val blobs = wetSegments(Tables.documents(s, dir), col("text"),
          gzip = false)
        graft.parse.Parsers.warc(blobs, col("blob"))
          .where(col("warc_type") === "conversion")
          .select(col("target_uri"), col("warc_date"),
            col("content_length"), col("payload"))
      },
      Some("""SELECT 'https://' || source || '.example.com/' || lang || '/'
                      || doc_id AS target_uri,
                    '2026-08-13T00:00:00Z' AS warc_date,
                    CAST(octet_length(encode(text)) AS BIGINT)
                      AS content_length,
                    text AS payload
             FROM documents""")
    ),

    // HTML→text extraction (the FineWeb/trafilatura step). The query
    // wraps each document in a real page skeleton — head with title,
    // body script with hostile '<'/'&&' content, style, comment, an
    // entity-encoded body (so text containing &/</> round-trips), an
    // injected entity suite (named, decimal, hex, bogus, unterminated)
    // and a trailing div block — then the operator extracts. The oracle
    // recomputes the flat truth from the original text, so stripping
    // order AND the entity scanner must both be right.
    GraftQuery(
      "x_html_extract",
      (s, dir) => {
        val pre = "<html><head><title>Ignored Title</title></head><body>" +
          "<script type=\"text/javascript\">var x = 1 < 2 && \"f&amp;o\";" +
          "</script><style>p{color:red}</style><!-- c --><p>"
        val post = " &amp; &lt;b&gt; &#65; &#x42; &quot;q&quot;&nbsp;" +
          "&bogus; &amp</p><div class=\"x\">suffix block</div></body></html>"
        val enc = expr(
          "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')")
        val docs = Tables.documents(s, dir)
          .withColumn("html", concat(lit(pre), enc, lit(post)))
        TextAnalysis.htmlExtract(docs, col("doc_id"), col("html"))
      },
      Some("""WITH h AS (
               SELECT doc_id, text,
                      '<html><head><title>Ignored Title</title></head><body>'
                      || '<script type="text/javascript">var x = 1 < 2 && "f&amp;o";'
                      || '</script><style>p{color:red}</style><!-- c --><p>'
                      || replace(replace(replace(text, '&', '&amp;'),
                           '<', '&lt;'), '>', '&gt;')
                      || ' &amp; &lt;b&gt; &#65; &#x42; &quot;q&quot;&nbsp;'
                      || '&bogus; &amp</p><div class="x">suffix block</div>'
                      || '</body></html>' AS html
               FROM documents),
             e AS (
               SELECT doc_id, html,
                      trim(regexp_replace(
                        text || ' & <b> A B "q" &bogus; &amp suffix block',
                        '\s+', ' ', 'g')) AS extracted
               FROM h)
             SELECT doc_id, extracted,
                    CAST(len(html) AS INT) AS n_chars_html,
                    CAST(len(extracted) AS INT) AS n_chars_extracted
             FROM e""")
    ),

    // End-to-end crawl→corpus pipeline: WET segments of real HTML pages
    // → warc_scan → doc identity from the target URI → HTML extraction
    // → Gopher gate → exact dedup keep-lowest-id. One query exercises
    // the whole ingest-to-curation chain; the oracle re-derives the
    // surviving doc set from flat truth, so every stage must be right.
    GraftQuery(
      "x_crawl_pipeline",
      (s, dir) => {
        val enc = expr(
          "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')")
        val page = concat(
          lit("<html><head><title>T</title></head><body>" +
            "<script>var x = 1 < 2;</script><p>"),
          enc, lit("</p></body></html>"))
        val blobs = wetSegments(Tables.documents(s, dir), page,
          gzip = false)
        val recs = graft.parse.Parsers.warc(blobs, col("blob"))
          .where(col("warc_type") === "conversion")
          .select(regexp_extract(col("target_uri"), "/([0-9]+)$", 1)
            .cast("long").as("doc_id"), col("payload"))
        val ex = TextAnalysis.htmlExtract(recs, col("doc_id"), col("payload"))
        val kept = TextAnalysis.gopherLabel(ex, col("extracted"),
            stops = Seq("the", "a", "data", "table", "row", "line", "key",
              "value"))
          .filter(col("label") === "keep")
        Dedup.exact(kept, col("doc_id"), col("extracted"))
          .select(col("doc_id"), col("n_words"),
            length(col("extracted")).as("n_chars"))
      },
      Some("""WITH x AS (
               SELECT doc_id,
                      trim(regexp_replace(text, '\s+', ' ', 'g')) AS cleaned
               FROM documents),
             g AS (
               SELECT doc_id, cleaned,
                      CAST(len(string_split(cleaned, ' ')) AS BIGINT)
                        AS n_words
               FROM x
               WHERE len(string_split(cleaned, ' ')) BETWEEN 50 AND 100000
                 AND list_sum(list_transform(string_split(cleaned, ' '),
                     x -> len(x)))
                     BETWEEN 3 * len(string_split(cleaned, ' '))
                         AND 10 * len(string_split(cleaned, ' '))
                 AND 10 * (len(regexp_extract_all(cleaned, '#'))
                      + len(regexp_extract_all(cleaned, '\.\.\.|…')))
                     <= len(string_split(cleaned, ' '))
                 AND 5 * len(list_filter(string_split(cleaned, ' '),
                     x -> regexp_matches(x, '[A-Za-z]')))
                     >= 4 * len(string_split(cleaned, ' '))
                 AND len(list_filter(
                     ['the','a','data','table','row','line','key','value'],
                     s -> list_contains(string_split(cleaned, ' '), s))) >= 2),
             d AS (
               SELECT doc_id, cleaned, n_words,
                      row_number() OVER (PARTITION BY md5(cleaned)
                        ORDER BY doc_id) AS rn
               FROM g)
             SELECT doc_id, n_words, CAST(len(cleaned) AS INT) AS n_chars
             FROM d WHERE rn = 1""")
    ),

    // Gzipped WET segments (.warc.wet.gz — how Common Crawl actually
    // ships): same build as x_warc_ingest but each segment compresses
    // through the gzip_compress expression and WarcScan inflates off
    // the magic bytes before scanning. Same flat-truth oracle.
    GraftQuery(
      "x_warc_gzip",
      (s, dir) => {
        val blobs = wetSegments(Tables.documents(s, dir), col("text"),
          gzip = true)
        graft.parse.Parsers.warc(blobs, col("blob"))
          .where(col("warc_type") === "conversion")
          .select(col("target_uri"), col("content_length"), col("payload"))
      },
      Some("""SELECT 'https://' || source || '.example.com/' || lang || '/'
                      || doc_id AS target_uri,
                    CAST(octet_length(encode(text)) AS BIGINT)
                      AS content_length,
                    text AS payload
             FROM documents""")
    ),

    // ftfy-style Unicode cleanup. The synthetic corpus is clean, so the
    // query injects the real-world defects deterministically by doc_id
    // class — a combining-mark 'café' (NFC must precompose), a BEL
    // control char, double-space runs with trailing blanks, and an NBSP
    // — then the operator under test normalizes them away. Both engines
    // replay the injection; NFC itself runs through our codegen
    // expression on the Spark side and utf8proc on DuckDB's.
    GraftQuery(
      "x_text_unicode",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .withColumn("t1", when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" cafe\u0301"))).otherwise(col("text")))
          .withColumn("t2", when(col("doc_id") % 7 === 0,
            concat(col("t1"), lit("\u0007alert"))).otherwise(col("t1")))
          .withColumn("t3", when(col("doc_id") % 5 === 0,
            concat(col("t2"), lit("  double  spaced  "))).otherwise(col("t2")))
          .withColumn("t4", when(col("doc_id") % 11 === 0,
            concat(col("t3"), lit(" a\u00a0b"))).otherwise(col("t3")))
        TextAnalysis.unicodeClean(docs, col("doc_id"), col("t4"))
      },
      Some("""WITH t AS (
               SELECT doc_id,
                 CASE WHEN doc_id % 11 = 0 THEN t3 || ' a' || chr(160) || 'b'
                      ELSE t3 END AS raw
               FROM (SELECT doc_id,
                       CASE WHEN doc_id % 5 = 0 THEN t2 || '  double  spaced  '
                            ELSE t2 END AS t3
                     FROM (SELECT doc_id,
                             CASE WHEN doc_id % 7 = 0 THEN t1 || chr(7) || 'alert'
                                  ELSE t1 END AS t2
                           FROM (SELECT doc_id,
                                   CASE WHEN doc_id % 3 = 0
                                        THEN text || ' cafe' || chr(769)
                                        ELSE text END AS t1
                                 FROM documents)))),
             n AS (SELECT doc_id, raw, nfc_normalize(raw) AS nfc FROM t),
             c AS (SELECT doc_id, raw, nfc,
                     trim(regexp_replace(
                       regexp_replace(
                         regexp_replace(nfc,
                           '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
                         '[\x{A0}\x{2007}\x{202F}]', ' ', 'g'),
                       ' {2,}', ' ', 'g')) AS cleaned
                   FROM n)
             SELECT doc_id, cleaned,
                    CAST(len(raw) AS INT) AS n_chars_raw,
                    CAST(len(cleaned) AS INT) AS n_chars_clean,
                    CASE WHEN nfc <> raw THEN 1 ELSE 0 END AS changed_nfc,
                    CASE WHEN regexp_matches(raw, '[\x00-\x08\x0B-\x1F\x7F]')
                         THEN 1 ELSE 0 END AS had_control
             FROM c""")
    ),

    // GPT-style sequence packing: 8 hash shards, 256-token sequences.
    // The oracle replays the identical shard assignment, hash-priority
    // window order, and integer div/mod chunk arithmetic.
    GraftQuery(
      "x_pack_sequences",
      (s, dir) =>
        TextAnalysis.packSequences(Tables.documents(s, dir),
          col("doc_id"), col("text"), seqLen = 256, nShards = 8),
      Some("""WITH t AS (
               SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                           ::BIGINT % 8 AS INT) AS shard
               FROM documents),
             c AS (
               SELECT doc_id, n_tokens, shard,
                      CAST(SUM(n_tokens) OVER (PARTITION BY shard
                        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_end
               FROM t)
             SELECT doc_id, n_tokens, shard, tok_end,
                    CAST(tok_end - n_tokens AS BIGINT) AS tok_begin,
                    CAST((tok_end - n_tokens) // 256 AS BIGINT) AS first_seq,
                    CAST((tok_end - 1) // 256 AS BIGINT) AS last_seq,
                    CAST((tok_end - n_tokens) % 256 AS BIGINT) AS seq_offset,
                    CAST((tok_end - 1) // 256 - (tok_end - n_tokens) // 256 + 1
                      AS BIGINT) AS n_seqs
             FROM c""")
    ),

    // URL blocklist gate. Synthetic URLs derive deterministically from
    // doc_id classes (subdomains, three TLDs, a blocklisted parent
    // domain, http vs https) so every code path — registrable-domain
    // block, exact-host block, pass — occurs; the blocklist mixes both
    // entry kinds.
    GraftQuery(
      "x_url_filter",
      (s, dir) => {
        val host = when(col("doc_id") % 4 === 0,
            concat(lit("www."), col("source"), lit(".com")))
          .when(col("doc_id") % 4 === 1, concat(col("source"), lit(".org")))
          .when(col("doc_id") % 4 === 2,
            concat(lit("cdn."), col("source"), lit(".badsite.net")))
          .otherwise(concat(col("source"), lit(".com")))
        val scheme = when(col("doc_id") % 3 === 0, "http").otherwise("https")
        val docs = Tables.documents(s, dir).withColumn("url",
          concat(scheme, lit("://"), host, lit("/"), col("lang"),
            lit("/"), col("doc_id").cast("string")))
        TextAnalysis.urlFilter(docs, col("doc_id"), col("url"),
          Seq("src3.com", "src7.org", "badsite.net", "www.src5.com"))
      },
      Some("""WITH u AS (
               SELECT doc_id,
                      CASE WHEN doc_id % 3 = 0 THEN 'http' ELSE 'https' END
                        AS scheme,
                      CASE WHEN doc_id % 4 = 0 THEN 'www.' || source || '.com'
                           WHEN doc_id % 4 = 1 THEN source || '.org'
                           WHEN doc_id % 4 = 2
                             THEN 'cdn.' || source || '.badsite.net'
                           ELSE source || '.com' END AS host,
                      '/' || lang || '/' || doc_id AS path
               FROM documents),
             p AS (
               SELECT doc_id, scheme, host,
                      array_to_string(string_split(host, '.')[-2:], '.')
                        AS domain,
                      path
               FROM u),
             r AS (
               SELECT p.*,
                      CASE WHEN domain IN ('src3.com','src7.org',
                                           'badsite.net','www.src5.com')
                             THEN 'domain'
                           WHEN host IN ('src3.com','src7.org',
                                         'badsite.net','www.src5.com')
                             THEN 'host'
                           ELSE 'ok' END AS reason
               FROM p)
             SELECT doc_id, scheme, host, domain, path, reason,
                    CASE WHEN reason = 'ok' THEN 1 ELSE 0 END AS kept
             FROM r""")
    ),

    // CCNet-style bigram-LM quality score (LM trained on the corpus in
    // the same job, exact fixed-point credit per bigram). Oracle
    // rebuilds both count tables and replays the integer arithmetic.
    GraftQuery(
      "x_lm_ngram_score",
      (s, dir) =>
        TextAnalysis.lmScore(Tables.documents(s, dir), col("doc_id"),
          col("text")),
      Some("""WITH toks AS (SELECT doc_id,
                      unnest(string_split(text,' ')) AS tok,
                      unnest(range(0, len(string_split(text,' ')))) AS pos
               FROM documents),
             c1 AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
                    FROM toks GROUP BY 1),
             v AS (SELECT CAST(count(*) AS BIGINT) AS vsz FROM c1),
             g AS (SELECT doc_id, tok || ' ' || lead(tok) OVER
                     (PARTITION BY doc_id ORDER BY pos) AS bigram
                   FROM toks),
             g2 AS (SELECT doc_id, bigram,
                           substr(bigram, 1, strpos(bigram,' ')-1) AS pre
                    FROM g WHERE bigram IS NOT NULL),
             c2 AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c
                    FROM g2 GROUP BY 1),
             sc AS (SELECT g2.doc_id,
                           (1000000 * (c2.c + 1)) // (c1.c + (SELECT vsz FROM v)) AS s
                    FROM g2 JOIN c2 USING (bigram)
                            JOIN c1 ON g2.pre = c1.tok)
             SELECT d.doc_id,
                    CAST(coalesce(count(sc.s), 0) AS BIGINT) AS n_bigrams,
                    CAST(coalesce(sum(sc.s), 0) AS BIGINT) AS lm_score
             FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
             GROUP BY 1""")
    ),

    // CCNet head/middle/tail perplexity split: thresholds derived from
    // a bounded value histogram (never a global sort), broadcast onto a
    // map-only label. Oracle rebuilds the LM, the histogram, the
    // desc-cumulative rank thresholds and the label rule.
    GraftQuery(
      "x_lm_ppl_buckets",
      (s, dir) =>
        TextAnalysis.perplexityBuckets(Tables.documents(s, dir),
          col("doc_id"), col("text")),
      Some("""WITH toks AS (SELECT doc_id,
                      unnest(string_split(text,' ')) AS tok,
                      unnest(range(0, len(string_split(text,' ')))) AS pos
               FROM documents),
             c1 AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
                    FROM toks GROUP BY 1),
             v AS (SELECT CAST(count(*) AS BIGINT) AS vsz FROM c1),
             g AS (SELECT doc_id, tok || ' ' || lead(tok) OVER
                     (PARTITION BY doc_id ORDER BY pos) AS bigram
                   FROM toks),
             g2 AS (SELECT doc_id, bigram,
                           substr(bigram, 1, strpos(bigram,' ')-1) AS pre
                    FROM g WHERE bigram IS NOT NULL),
             c2 AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c
                    FROM g2 GROUP BY 1),
             sc AS (SELECT g2.doc_id,
                           (1000000 * (c2.c + 1)) // (c1.c + (SELECT vsz FROM v)) AS s
                    FROM g2 JOIN c2 USING (bigram)
                            JOIN c1 ON g2.pre = c1.tok),
             agg AS (SELECT d.doc_id,
                    CAST(coalesce(count(sc.s), 0) AS BIGINT) AS n_bigrams,
                    CAST(coalesce(sum(sc.s), 0) AS BIGINT) AS lm_score
                    FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
                    GROUP BY 1),
             base AS (SELECT doc_id, n_bigrams,
                      CAST(CASE WHEN n_bigrams > 0
                           THEN lm_score // n_bigrams ELSE 0 END AS BIGINT)
                        AS avg_credit FROM agg),
             hist AS (SELECT avg_credit AS hv, CAST(count(*) AS BIGINT) AS c
                      FROM base GROUP BY 1),
             cum AS (SELECT hv, CAST(sum(c) OVER (ORDER BY hv DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS ge FROM hist),
             n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM base),
             th AS (SELECT
                      max(CASE WHEN ge >= (SELECT (nn + 2) // 3 FROM n)
                          THEN hv END) AS h,
                      max(CASE WHEN ge >= (SELECT (2*nn + 2) // 3 FROM n)
                          THEN hv END) AS m
                    FROM cum)
             SELECT doc_id, n_bigrams, avg_credit,
                    CASE WHEN avg_credit >= (SELECT h FROM th) THEN 'head'
                         WHEN avg_credit >= (SELECT m FROM th) THEN 'middle'
                         ELSE 'tail' END AS bucket
             FROM base""")
    ),

    // BPE merge induction over the word-count histogram: the first 4
    // tokenizer merges, deterministically tie-broken. Oracle replays
    // each merge with chained CTEs (argmax scalar subquery + padded
    // replace), mirroring the k-means chained-CTE pattern.
    GraftQuery(
      "x_bpe_train",
      (s, dir) =>
        TextAnalysis.bpeTrain(Tables.documents(s, dir), col("text"),
          merges = 4),
      Some("""WITH w AS (SELECT tok AS word, CAST(count(*) AS BIGINT) AS cnt
               FROM (SELECT unnest(string_split(text,' ')) AS tok
                     FROM documents)
               WHERE regexp_matches(tok, '^[a-z]+$') GROUP BY 1),
             s0 AS (SELECT array_to_string(list_transform(
                      range(1, len(word)+1), i -> word[i]), ' ') AS seg,
                      cnt FROM w),
             p1 AS (SELECT unnest(list_transform(range(1, len(l)),
                      i -> l[i] || ' ' || l[i+1])) AS pair, cnt
                    FROM (SELECT string_split(seg,' ') AS l, cnt FROM s0)),
             k1 AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS c
                    FROM p1 GROUP BY 1),
             m1 AS (SELECT pair, c FROM k1 ORDER BY c DESC, pair LIMIT 1),
             s1 AS (SELECT trim(replace(' '||seg||' ',
                      ' '||(SELECT pair FROM m1)||' ',
                      ' '||replace((SELECT pair FROM m1),' ','')||' ')) AS seg,
                      cnt FROM s0),
             p2 AS (SELECT unnest(list_transform(range(1, len(l)),
                      i -> l[i] || ' ' || l[i+1])) AS pair, cnt
                    FROM (SELECT string_split(seg,' ') AS l, cnt FROM s1)),
             k2 AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS c
                    FROM p2 GROUP BY 1),
             m2 AS (SELECT pair, c FROM k2 ORDER BY c DESC, pair LIMIT 1),
             s2 AS (SELECT trim(replace(' '||seg||' ',
                      ' '||(SELECT pair FROM m2)||' ',
                      ' '||replace((SELECT pair FROM m2),' ','')||' ')) AS seg,
                      cnt FROM s1),
             p3 AS (SELECT unnest(list_transform(range(1, len(l)),
                      i -> l[i] || ' ' || l[i+1])) AS pair, cnt
                    FROM (SELECT string_split(seg,' ') AS l, cnt FROM s2)),
             k3 AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS c
                    FROM p3 GROUP BY 1),
             m3 AS (SELECT pair, c FROM k3 ORDER BY c DESC, pair LIMIT 1),
             s3 AS (SELECT trim(replace(' '||seg||' ',
                      ' '||(SELECT pair FROM m3)||' ',
                      ' '||replace((SELECT pair FROM m3),' ','')||' ')) AS seg,
                      cnt FROM s2),
             p4 AS (SELECT unnest(list_transform(range(1, len(l)),
                      i -> l[i] || ' ' || l[i+1])) AS pair, cnt
                    FROM (SELECT string_split(seg,' ') AS l, cnt FROM s3)),
             k4 AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS c
                    FROM p4 GROUP BY 1),
             m4 AS (SELECT pair, c FROM k4 ORDER BY c DESC, pair LIMIT 1)
             SELECT * FROM (
               SELECT 1 AS step, pair, replace(pair,' ','') AS merged,
                      c AS cnt FROM m1
               UNION ALL SELECT 2, pair, replace(pair,' ',''), c FROM m2
               UNION ALL SELECT 3, pair, replace(pair,' ',''), c FROM m3
               UNION ALL SELECT 4, pair, replace(pair,' ',''), c FROM m4)""")
    ),

    // BPE ENCODE — apply the merges x_bpe_train learns to tokenize the
    // corpus (the budget number a pipeline actually needs: how many
    // tokens does each document cost under this tokenizer). The merge
    // table is driver model state (4 rows); application is one map-only
    // fold over the word array. The oracle re-derives the same 4 merges
    // (the x_bpe_train chain) and replays the padded-replace encode per
    // word.
    GraftQuery(
      "x_bpe_encode",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val merges = TextAnalysis.bpeTrain(docs, col("text"), merges = 4)
          .collect().sortBy(_.getInt(0))
          .map(r => (r.getString(1), r.getString(2))).toSeq
        TextAnalysis.bpeApply(docs, col("doc_id"), col("text"), merges)
      },
      Some("""WITH w AS (SELECT tok AS word, CAST(count(*) AS BIGINT) AS cnt
               FROM (SELECT unnest(string_split(text,' ')) AS tok
                     FROM documents)
               WHERE regexp_matches(tok, '^[a-z]+$') GROUP BY 1),
             s0 AS (SELECT array_to_string(list_transform(
                      range(1, len(word)+1), i -> word[i]), ' ') AS seg,
                      cnt FROM w),
             p1 AS (SELECT unnest(list_transform(range(1, len(l)),
                      i -> l[i] || ' ' || l[i+1])) AS pair, cnt
                    FROM (SELECT string_split(seg,' ') AS l, cnt FROM s0)),
             k1 AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS c
                    FROM p1 GROUP BY 1),
             m1 AS (SELECT pair, c FROM k1 ORDER BY c DESC, pair LIMIT 1),
             s1 AS (SELECT trim(replace(' '||seg||' ',
                      ' '||(SELECT pair FROM m1)||' ',
                      ' '||replace((SELECT pair FROM m1),' ','')||' ')) AS seg,
                      cnt FROM s0),
             p2 AS (SELECT unnest(list_transform(range(1, len(l)),
                      i -> l[i] || ' ' || l[i+1])) AS pair, cnt
                    FROM (SELECT string_split(seg,' ') AS l, cnt FROM s1)),
             k2 AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS c
                    FROM p2 GROUP BY 1),
             m2 AS (SELECT pair, c FROM k2 ORDER BY c DESC, pair LIMIT 1),
             s2 AS (SELECT trim(replace(' '||seg||' ',
                      ' '||(SELECT pair FROM m2)||' ',
                      ' '||replace((SELECT pair FROM m2),' ','')||' ')) AS seg,
                      cnt FROM s1),
             p3 AS (SELECT unnest(list_transform(range(1, len(l)),
                      i -> l[i] || ' ' || l[i+1])) AS pair, cnt
                    FROM (SELECT string_split(seg,' ') AS l, cnt FROM s2)),
             k3 AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS c
                    FROM p3 GROUP BY 1),
             m3 AS (SELECT pair, c FROM k3 ORDER BY c DESC, pair LIMIT 1),
             s3 AS (SELECT trim(replace(' '||seg||' ',
                      ' '||(SELECT pair FROM m3)||' ',
                      ' '||replace((SELECT pair FROM m3),' ','')||' ')) AS seg,
                      cnt FROM s2),
             p4 AS (SELECT unnest(list_transform(range(1, len(l)),
                      i -> l[i] || ' ' || l[i+1])) AS pair, cnt
                    FROM (SELECT string_split(seg,' ') AS l, cnt FROM s3)),
             k4 AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS c
                    FROM p4 GROUP BY 1),
             m4 AS (SELECT pair, c FROM k4 ORDER BY c DESC, pair LIMIT 1),
             dw AS (SELECT doc_id, unnest(string_split(text,' ')) AS word
                    FROM documents),
             fw AS (SELECT doc_id, word FROM dw
                    WHERE regexp_matches(word, '^[a-z]+$')),
             a0 AS (SELECT doc_id, word, array_to_string(list_transform(
                      range(1, len(word)+1), i -> word[i]), ' ') AS seg
                    FROM fw),
             a1 AS (SELECT doc_id, word, trim(replace(' '||seg||' ',
                      ' '||(SELECT pair FROM m1)||' ',
                      ' '||replace((SELECT pair FROM m1),' ','')||' ')) AS seg
                    FROM a0),
             a2 AS (SELECT doc_id, word, trim(replace(' '||seg||' ',
                      ' '||(SELECT pair FROM m2)||' ',
                      ' '||replace((SELECT pair FROM m2),' ','')||' ')) AS seg
                    FROM a1),
             a3 AS (SELECT doc_id, word, trim(replace(' '||seg||' ',
                      ' '||(SELECT pair FROM m3)||' ',
                      ' '||replace((SELECT pair FROM m3),' ','')||' ')) AS seg
                    FROM a2),
             a4 AS (SELECT doc_id, word, trim(replace(' '||seg||' ',
                      ' '||(SELECT pair FROM m4)||' ',
                      ' '||replace((SELECT pair FROM m4),' ','')||' ')) AS seg
                    FROM a3),
             agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                            CAST(sum(len(word)) AS BIGINT) AS n_chars,
                            CAST(sum(len(string_split(seg,' '))) AS BIGINT)
                              AS n_symbols
                     FROM a4 GROUP BY 1)
             SELECT d.doc_id, coalesce(agg.n_words, 0) AS n_words,
                    coalesce(agg.n_chars, 0) AS n_chars,
                    coalesce(agg.n_symbols, 0) AS n_symbols
             FROM documents d LEFT JOIN agg USING (doc_id)""")
    ),

    // Deterministic per-language stratified downsampling: exact integer
    // Bernoulli(target/n) on the stable id hash; broadcast per-stratum
    // counts onto a map-only filter.
    GraftQuery(
      "x_sample_stratified",
      (s, dir) =>
        TextAnalysis.stratifiedSample(Tables.documents(s, dir),
          col("doc_id"), col("lang"), target = 100L),
      Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS cnt
                         FROM documents GROUP BY 1)
             SELECT d.doc_id, d.lang
             FROM documents d JOIN c USING (lang)
             WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                    % 10000) * c.cnt < 100 * 10000""")
    ),

    // Exact p50/p90/p99/p999 over a bounded value domain: the corpus
    // collapses to its histogram in one keyed aggregate, a window
    // cumsum over the |domain|-row histogram picks the smallest value
    // reaching each integer-ceiling rank — exact quantiles with no
    // data sort, the shape that survives 100 TB for bucketed metrics.
    GraftQuery(
      "x_quantiles_exact",
      (s, dir) =>
        graft.ops.Quantiles.exactQuantiles(Tables.lineitem(s, dir),
          col("l_quantity")),
      Some("""WITH c AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                     CAST(count(*) AS BIGINT) AS cnt
                   FROM lineitem GROUP BY 1),
             cc AS (SELECT v,
                      sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                        AS cum,
                      sum(cnt) OVER () AS total
                    FROM c),
             q AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10),
                     ('p99', 99, 100), ('p999', 999, 1000))
                     AS t(q, num, den)),
             j AS (SELECT q.q,
                     (cc.total * q.num + q.den - 1) // q.den AS needed,
                     cc.v, cc.cum
                   FROM cc, q)
             SELECT q, CAST(min(needed) AS BIGINT) AS rank_needed,
                    CAST(min(v) AS BIGINT) AS value
             FROM j WHERE cum >= needed GROUP BY q""")
    ),

    // Grouped HLL: COUNT(DISTINCT orderkey) per returnflag as sketches
    // — aggregate key cardinality ≤ |groups|·m at ANY row count, one
    // row per group out. `ok` gates each group's estimate at the same
    // ±20% ≈ 3σ bound against its exact count.
    GraftQuery(
      "x_sketch_hll_grouped",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val est = graft.sketch.Sketches.hllGroupedEstimate(li,
          col("l_returnflag"), col("l_orderkey"))
        val exact = li.groupBy(col("l_returnflag").as("g"))
          .agg(countDistinct(col("l_orderkey")).as("exact_cnt"))
        est.join(exact, "g")
          .select(col("g"), col("nonzero_buckets"), col("s_scaled"),
            col("est"), col("exact_cnt"),
            (abs(col("est") - col("exact_cnt")) * 5 <= col("exact_cnt"))
              .as("ok"))
      },
      Some("""WITH h AS (SELECT l_returnflag AS g,
                     ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),
                       1, 8))::BIGINT AS h
                   FROM lineitem),
             regs AS (SELECT g, h % 256 AS bucket,
                       max(CASE WHEN h // 256 = 0 THEN 25
                           ELSE 25 - length(bin(h // 256)) END) AS register
                      FROM h GROUP BY 1, 2),
             agg AS (SELECT g, CAST(count(*) AS BIGINT) AS nb,
                       CAST(sum(1::BIGINT << (25 - register)) AS BIGINT)
                         AS s_present
                     FROM regs GROUP BY 1),
             fin AS (SELECT g, nb,
                       s_present + (256 - nb) * (1::BIGINT << 25) AS s_scaled
                     FROM agg),
             est AS (SELECT *,
                       (71827 * ((CAST(256 * 256 AS BIGINT) *
                         (1::BIGINT << 25)) // s_scaled)) // 100000 AS est
                     FROM fin),
             ex AS (SELECT l_returnflag AS g,
                      CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_cnt
                    FROM lineitem GROUP BY 1)
             SELECT est.g, nb AS nonzero_buckets, s_scaled, est, exact_cnt,
                    abs(est - exact_cnt) * 5 <= exact_cnt AS ok
             FROM est JOIN ex USING (g)""")
    ),

    // The grouped sketch's production path in isolation (register
    // tables per group, ≤ |groups|·m rows, no exact pass) — yardstick
    // twin of x_sketch_hll_grouped, as x_sketch_hll_build is for the
    // ungrouped gate.
    GraftQuery(
      "x_sketch_hll_grouped_build",
      (s, dir) =>
        graft.sketch.Sketches.hllGroupedRegisters(Tables.lineitem(s, dir),
          col("l_returnflag"), col("l_orderkey")),
      Some("""WITH h AS (SELECT l_returnflag AS g,
                     ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),
                       1, 8))::BIGINT AS h
                   FROM lineitem)
             SELECT g, h % 256 AS bucket,
                    CAST(max(CASE WHEN h // 256 = 0 THEN 25
                             ELSE 25 - length(bin(h // 256)) END) AS INT)
                      AS register
             FROM h GROUP BY 1, 2""")
    ),

    // Per-service percentiles: the grouped twin of x_quantiles_exact —
    // the window partitions by group, so histogram rows spread across
    // the cluster and no single-partition sort exists anywhere.
    GraftQuery(
      "x_quantiles_grouped",
      (s, dir) =>
        graft.ops.Quantiles.groupedQuantiles(Tables.events(s, dir),
          col("event_type"), floor(col("value"))),
      Some("""WITH c AS (SELECT event_type AS g,
                     CAST(floor(value) AS BIGINT) AS v,
                     CAST(count(*) AS BIGINT) AS cnt
                   FROM events GROUP BY 1, 2),
             cc AS (SELECT g, v,
                      sum(cnt) OVER (PARTITION BY g ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS cum,
                      sum(cnt) OVER (PARTITION BY g) AS total
                    FROM c),
             q AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10),
                     ('p99', 99, 100), ('p999', 999, 1000))
                     AS t(q, num, den)),
             j AS (SELECT cc.g, q.q,
                     (cc.total * q.num + q.den - 1) // q.den AS needed,
                     cc.v, cc.cum
                   FROM cc, q)
             SELECT g, q, CAST(min(needed) AS BIGINT) AS rank_needed,
                    CAST(min(v) AS BIGINT) AS value
             FROM j WHERE cum >= needed GROUP BY g, q""")
    ),

    // Temperature-flattened domain mixture (UniMax/mT5 α=0.5): keep
    // probability ∝ √n_d/n_d damps head domains; integer-exact weights
    // (⌊√n⌋, integer normalizer, precomputed integer thresholds) make
    // the draw replayable in any engine. Domains derived skewed from
    // doc_id (sizes ∝ 2k+1) since the table's own source field is
    // uniform. Broadcast thresholds, map-only keep — corpus never
    // shuffles.
    GraftQuery(
      "x_mix_temperature",
      (s, dir) => {
        val docs = Tables.documents(s, dir).withColumn("dom",
          concat(lit("d"), expr(
            "CAST(floor(sqrt(CAST(doc_id % 256 AS DOUBLE))) AS BIGINT)")
            .cast("string")))
        TextAnalysis.temperatureMix(docs, col("doc_id"), col("dom"))
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
                     ((n_total // 4) * 1048576 * s_d) // (s_sum * n_d) AS thr
                   FROM c, n)
             SELECT d.doc_id, d.domain, t.n_d, t.thr,
                    ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 5))::BIGINT
                      < t.thr AS kept
             FROM d JOIN t USING (domain)""")
    ),

    // RAG chunking: 64-token windows at stride 48 (16-token overlap),
    // tail-clamped; map-only generate.
    GraftQuery(
      "x_chunk_overlap",
      (s, dir) =>
        TextAnalysis.chunkOverlap(Tables.documents(s, dir), col("doc_id"),
          col("text"), win = 64, stride = 48),
      Some("""WITH d AS (SELECT doc_id, string_split(text,' ') AS w
                         FROM documents),
             ix AS (SELECT doc_id, w,
                      unnest(range(0, CASE WHEN len(w) <= 64 THEN 1
                                      ELSE 1 + (len(w) - 64 + 47) // 48 END))
                        AS i
                    FROM d)
             SELECT doc_id, i AS chunk_ix,
                    CAST(len(w[i*48+1 : i*48+64]) AS BIGINT) AS n_tokens,
                    array_to_string(w[i*48+1 : i*48+64], ' ') AS chunk
             FROM ix""")
    )
  )
}
