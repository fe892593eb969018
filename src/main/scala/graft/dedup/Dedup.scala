package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  * None of these exist in the reference (fluent-bit has no dedup) — they
  * are the north-star extensions (BASELINE.json) designed Spark-first for
  * the 100 TB case:
  *
  *   - exact: one shuffle on a 16-byte hash, not on the document text;
  *   - MinHash+LSH: shingle→minhash→band→bucket-join — candidate pairs
  *     come from an equi-join on (band, signature), so the shuffle key
  *     space is tiny and skew-free; never O(n²);
  *   - SimHash: 64-bit signature via xxhash64 bit-votes; near-dup pairs
  *     are exact-signature or banded-hamming joins;
  *   - exact n-gram Jaccard runs only on LSH candidates.
  *
  * Plan-shape invariants (checked via .explain during development):
  * shingle generation is NARROW (array slicing on the tokenized text, no
  * window/sort); minhash signatures aggregate elementwise-min map-side,
  * so the only shuffle carries (doc_id, k strings) — never the k-times
  * exploded hash stream.
  */
object Dedup {

  /** Exact dedup: keep the first row (by `orderCol`) of each group of
    * identical `textCol` values. GroupBy on md5 keeps shuffle rows narrow
    * (hash + id, not the document body).
    */
  def exact(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val w = Window.partitionBy(md5(textCol)).orderBy(idCol)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Dup-group summary: content hash → representative id + cardinality. */
  def exactGroups(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(md5(textCol).as("content_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Word n-gram shingles as (doc_id, shingle) rows. Narrow: one
    * codegen'd loop per document ([[graft.functions.WordShingles]]), no
    * window function, no shuffle, no per-document sort.
    */
  def shingles(df: DataFrame, idCol: Column, textCol: Column, n: Int): DataFrame =
    df.select(idCol.as("doc_id"),
      explode(graft.functions.TextFunctions.wordShingles(textCol, n)).as("shingle"))

  /** MinHash signatures in wide form: (doc_id, mhs ARRAY<STRING> of k).
    * Hash family: the 64 hex chars of `md5(s) || md5('x'||s)` cut into
    * eight independent 8-hex (32-bit) slices — h_i(s) = slice i,
    * signature element i = min over shingles. TWO digest evaluations per
    * shingle produce all k ≤ 8 hash functions (vs one digest per
    * function), and the elementwise-min aggregates map-side, so the
    * shuffle carries one row of k strings per (partition, doc). Hex min
    * ≡ numeric min and is portable (bit-identical in any SQL engine).
    */
  def minhash(sh: DataFrame, k: Int = 8): DataFrame = {
    require(k <= 8, s"slice hash family yields at most 8 functions, got $k")
    val hs = sh.select(col("doc_id"),
      concat(md5(col("shingle")), md5(concat(lit("x"), col("shingle")))).as("hx"))
    hs.groupBy(col("doc_id"))
      .agg(array((0 until k).map(i =>
        min(substring(col("hx"), i * 8 + 1, 8))): _*).as("mhs"))
  }

  /** LSH banding over wide signatures: band b's signature = md5 of the
    * ordered concat of its `rowsPerBand` minhashes. Docs sharing any
    * (band, signature) are candidates.
    */
  def bandSignatures(mh: DataFrame, k: Int, rowsPerBand: Int): DataFrame = {
    val nBands = k / rowsPerBand
    mh.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)),
        b => md5(concat_ws(",", slice(col("mhs"), b * rowsPerBand + 1, lit(rowsPerBand))))))
        .as(Seq("band", "sig")))
  }

  /** Candidate pairs: equi-join on (band, sig), deduped, a<b. */
  def candidatePairs(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band"), col("sig"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band"), col("sig"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Estimated Jaccard from minhash agreement on candidate pairs: two
    * joins bring both wide signatures onto the pair row; agreement is an
    * elementwise compare of two k-arrays (no k-way row explosion).
    */
  def estimatedJaccard(pairs: DataFrame, mh: DataFrame, k: Int): DataFrame = {
    val ma = mh.select(col("doc_id").as("doc_a"), col("mhs").as("mhs_a"))
    val mb = mh.select(col("doc_id").as("doc_b"), col("mhs").as("mhs_b"))
    pairs.join(ma, "doc_a").join(mb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (aggregate(zip_with(col("mhs_a"), col("mhs_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v) / lit(k.toDouble)).as("est_jaccard"))
  }

  /** Exact n-gram Jaccard on (already-narrowed) candidate pairs:
    * |A∩B| / |A∪B| over distinct shingle sets.
    */
  def exactJaccard(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val distinctSh = sh.distinct()
    val sizes = distinctSh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val sa = distinctSh.select(col("doc_id").as("doc_a"), col("shingle"))
    val sb = distinctSh.select(col("doc_id").as("doc_b"), col("shingle"))
    val inter = pairs.join(sa, "doc_a").join(sb, Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left").na.fill(0L, Seq("inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
  }

  /** Full MinHash-LSH near-dup pipeline. Default k=8, r=2 ⇒ 4 bands,
    * candidate threshold ≈ (1/4)^(1/2) = 0.5 estimated Jaccard.
    */
  def minhashLsh(df: DataFrame, idCol: Column, textCol: Column,
                 ngram: Int = 3, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val sh = shingles(df, idCol, textCol, ngram)
    val mh = minhash(sh, k)
    val pairs = candidatePairs(bandSignatures(mh, k, rowsPerBand))
    exactJaccard(pairs, sh)
  }

  /** 64-bit SimHash: per token, xxhash64 bit-votes (+1/-1 per bit), sign
    * of the vote sum per bit. Pure expressions — no UDF.
    */
  def simhash64(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val toks = df.select(idCol.as("doc_id"), explode(split(textCol, " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b")
    }
    toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b => when(col(s"v$b") >= 0, lit(1L)).otherwise(lit(0L))
          .multiply(lit(1L << b))).reduce(_ + _).as("simhash"))
  }

  /** Portable 16-bit SimHash variant (md5-hex-char parity votes) — the
    * oracle-checkable form; same algorithm, narrower signature.
    */
  def simhash16(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val toks = df.select(idCol.as("doc_id"), explode(split(textCol, " ")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val votes = (1 to 16).map { p =>
      sum(when(ascii(substring(col("h"), p, 1)) % 2 === 1, 1).otherwise(-1)).as(s"v$p")
    }
    toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        concat((1 to 16).map(p =>
          when(col(s"v$p") >= 0, lit(1)).otherwise(lit(0)).cast("string")): _*).as("simhash16"))
  }
}
