package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text search over the corpus: positional inverted index, phrase
  * queries, and boolean retrieval — the query side of shipping logs into
  * a search backend (the reference's out_es/out_opensearch send documents
  * TO such an index; here the engine IS the index).
  *
  * Spark-first shapes:
  *   - the positional index is one Generate (posexplode) + one
  *     (term, doc) aggregate — shuffled by term so hot terms spread by
  *     doc within a term's hash partition, and partial aggregation
  *     compacts (term, doc) pairs map-side;
  *   - phrase matching joins the two terms' position lists doc-by-doc
  *     (adjacency = pos₂ = pos₁+1) — a keyed equi-join on doc_id, never
  *     a cross join, with the rarer term filtered FIRST so the join's
  *     left side is the smaller posting list;
  *   - boolean AND/NOT needs NO join at all: one doc-keyed aggregate
  *     computes per-doc term-presence flags (max of indicator), the
  *     predicate is a map-side filter over the flags.
  *
  * Positions serialize as comma-joined strings (deterministic sort) so
  * any engine hashes them identically.
  */
object Search {

  /** (doc_id, term, pos) token stream; pos is the 0-based word offset. */
  def tokens(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"),
        posexplode(split(text, " ")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .withColumn("pos", col("pos").cast("long"))

  /** Positional postings: one row per (term, doc) with tf, first
    * position, and the full sorted position list.
    */
  def postings(docs: DataFrame, id: Column, text: Column): DataFrame =
    tokens(docs, id, text)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), min(col("pos")).as("first_pos"),
        array_join(sort_array(collect_list(col("pos"))), ",")
          .as("positions"))

  /** Exact phrase search (two-term): docs where `t2` immediately follows
    * `t1`, with match count and first match position.
    */
  def phrase(docs: DataFrame, id: Column, text: Column,
             t1: String, t2: String): DataFrame = {
    val toks = tokens(docs, id, text)
    val a = toks.filter(col("term") === t1)
      .select(col("doc_id"), col("pos").as("p1"))
    val b = toks.filter(col("term") === t2)
      .select(col("doc_id").as("doc_b"), col("pos").as("p2"))
    a.join(b, col("doc_id") === col("doc_b") && col("p2") === col("p1") + 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("p1")).as("first_pos"))
  }

  /** Boolean retrieval: docs containing ALL of `all`, NONE of `none` —
    * one doc-keyed aggregate over presence flags, zero joins.
    */
  def boolean(docs: DataFrame, id: Column, text: Column,
              all: Seq[String], none: Seq[String]): DataFrame = {
    val toks = tokens(docs, id, text)
    val flags =
      all.map(t => max((col("term") === t).cast("long")).as(s"has_$t")) ++
        none.map(t => max((col("term") === t).cast("long")).as(s"not_$t"))
    val agg = toks.groupBy(col("doc_id"))
      .agg(flags.head, flags.tail: _*)
    val pred = (all.map(t => col(s"has_$t") === 1L) ++
      none.map(t => col(s"not_$t") === 0L)).reduce(_ && _)
    agg.filter(pred).select(col("doc_id"))
  }

  /** BM25 top-k ranking for a small literal term set, k1 = 6/5, b = 3/4.
    *
    * Every BM25 factor is kept RATIONAL — with S = Σdl and N = |docs|,
    *   tf-part  = 22·tf·S / (10·tf·S + 3·S + 9·dl·N)
    *   idf      = (2N − 2df + 1) / (2df + 1)
    * so numerator and denominator are exact BIGINTs and the only float
    * op is ONE double division at the end — identical operands, identical
    * IEEE result on any engine, which is what lets a ranking score
    * hash-match a DuckDB replay.
    *
    * Plan: the query-term filter lands BEFORE the (term, doc) aggregate,
    * so only matching postings shuffle; dl is the one corpus-wide
    * doc-keyed aggregate; df comes from a term-partitioned window over
    * the already-tiny tf relation; N and S broadcast as one row; the
    * per-term top-k is a rank-filter window (WindowGroupLimit map-side).
    */
  def bm25(docs: DataFrame, id: Column, text: Column,
           terms: Seq[String], k: Int): DataFrame = {
    val toks = tokens(docs, id, text)
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val totals = toks.agg(count(lit(1)).as("s_tokens"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
    val tf = toks.filter(col("term").isin(terms: _*))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("term"))))
    val num = (lit(2L) * col("n_docs") - lit(2L) * col("df") + 1L) *
      lit(22L) * col("tf") * col("s_tokens")
    val den = (lit(2L) * col("df") + 1L) *
      (lit(10L) * col("tf") * col("s_tokens") + lit(3L) * col("s_tokens") +
        lit(9L) * col("dl") * col("n_docs"))
    val scored = tf.join(dl, "doc_id").crossJoin(broadcast(totals))
      .withColumn("score", num.cast("double") / den.cast("double"))
    scored
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
          .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"),
        col("score"), col("rk"))
  }

  /** Hybrid retrieval via reciprocal-rank fusion (Cormack/Clarke/Büttcher
    * RRF — the fusion OpenSearch/Elasticsearch ship for lexical⊕dense
    * hybrid queries): each leg contributes 1/(kRrf + rank) for the ids it
    * ranked; candidates absent from a leg contribute nothing. Scores are
    * INTEGER fixed-point (1e9 // (kRrf + rank)) so the fused ordering is
    * exact and engine-portable — no float summation order to defend.
    *
    * Scale shape: each leg is already a top-k relation (≤ k rows per
    * query), so the fusion input is bounded by Σ legs·k regardless of
    * corpus size — the union + groupBy shuffles candidate IDS only, and
    * the final global ordering runs on ≤ legs·k rows. The expensive part
    * of hybrid retrieval is the legs (bm25, ANN), each independently
    * gated; fusion itself is corpus-size-free.
    */
  def rrfFuse(legs: Seq[DataFrame], idCol: String, rankCol: String,
              kRrf: Int = 60, topK: Int = 10): DataFrame = {
    require(legs.nonEmpty, "rrf needs at least one ranked leg")
    val contribs = legs.map(_.select(col(idCol),
      expr(s"1000000000 div ($kRrf + $rankCol)").as("__contrib")))
    contribs.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("__contrib")).as("rrf_fp"),
        count(lit(1)).as("n_legs"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rrf_fp").desc, col(idCol))).cast("long"))
      .filter(col("rank") <= topK)
  }
}
