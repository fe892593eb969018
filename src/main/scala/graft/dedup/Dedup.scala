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

  /** Word n-gram shingles: (id, shingle) rows, positions via posexplode —
    * narrow (no shuffle) until the downstream aggregation.
    */
  def shingles(df: DataFrame, idCol: Column, textCol: Column, n: Int): DataFrame = {
    val toks = df.select(idCol.as("doc_id"),
      posexplode(split(textCol, " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val withNext = (1 until n).foldLeft(toks) { (d, i) =>
      d.withColumn(s"tok$i", lead(col("tok"), i).over(w))
    }
    val parts = col("tok") +: (1 until n).map(i => col(s"tok$i"))
    withNext
      .filter(parts.map(_.isNotNull).reduce(_ && _))
      .select(col("doc_id"), concat_ws(" ", parts: _*).as("shingle"))
  }

  /** MinHash signatures: k independent hash functions h_i(s)=md5(i|s),
    * signature = per-i minimum. md5-hex min is portable (same in any
    * SQL engine) — the library also offers xxhash64 for speed.
    */
  def minhash(sh: DataFrame, k: Int, fast: Boolean = false): DataFrame = {
    val hashes = sh
      .withColumn("i", explode(array((0 until k).map(lit): _*)))
      .withColumn("h",
        if (fast) xxhash64(concat(col("i"), lit("|"), col("shingle"))).cast("string")
        else md5(concat(col("i"), lit("|"), col("shingle"))))
    hashes.groupBy(col("doc_id"), col("i")).agg(min(col("h")).as("mh"))
  }

  /** LSH banding: group the k minhashes into bands of `rowsPerBand`; band
    * signature = ordered concat. Docs sharing any (band, signature) are
    * candidates.
    */
  def bandSignatures(mh: DataFrame, rowsPerBand: Int): DataFrame =
    mh.withColumn("band", (col("i") / rowsPerBand).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(md5(concat_ws(",",
        transform(array_sort(collect_list(struct(col("i"), col("mh")))),
          s => s.getField("mh")))).as("sig"))

  /** Candidate pairs: equi-join on (band, sig), deduped, a<b. */
  def candidatePairs(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band"), col("sig"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band"), col("sig"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Estimated Jaccard from minhash agreement on candidate pairs. */
  def estimatedJaccard(pairs: DataFrame, mh: DataFrame, k: Int): DataFrame = {
    val ma = mh.select(col("doc_id").as("doc_a"), col("i"), col("mh").as("mh_a"))
    val mb = mh.select(col("doc_id").as("doc_b"), col("i"), col("mh").as("mh_b"))
    pairs.join(ma, "doc_a").join(mb, Seq("doc_b", "i"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg((sum(when(col("mh_a") === col("mh_b"), 1).otherwise(0)) /
        lit(k.toDouble)).as("est_jaccard"))
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

  /** Full MinHash-LSH near-dup pipeline. */
  def minhashLsh(df: DataFrame, idCol: Column, textCol: Column,
                 ngram: Int = 3, k: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val sh = shingles(df, idCol, textCol, ngram)
    val mh = minhash(sh, k)
    val pairs = candidatePairs(bandSignatures(mh, rowsPerBand))
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
          when(col(s"v$p") >= 0, lit("1")).otherwise(lit("0"))): _*).as("simhash16"))
  }
}
