package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`) — north-star extension (BASELINE.json).
  *
  * Scale design: the brute-force path broadcasts the (small) query set
  * and streams the candidate corpus — a map-only plan, no shuffle of the
  * corpus; dot products run as `aggregate(zip_with(...))` column
  * expressions inside codegen. The LSH path buckets vectors by
  * random-hyperplane signatures so candidate generation is an equi-join
  * on (bucket), which partitions evenly at any corpus size.
  */
object Similarity {

  /** dot(a, b) as a pure column expression. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors of each query vector.
    * `queries` must be small (it is broadcast); ranking uses the rounded
    * cosine + id tiebreak so results are reproducible across engines.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val scored = q.join(c, col("qid") =!= col("cid"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 3))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("cos"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * derived from md5 so any engine reproduces the same planes —
    * hex char code mapped to a signed weight.
    */
  def planeComponent(plane: Int, dim: Column): Column =
    (ascii(substring(md5(concat(lit(plane.toString), lit("_"), dim)), 1, 1)) - lit(80))
      .cast("double")

  /** Random-hyperplane LSH signature (`nPlanes` sign bits) per vector.
    * Scale path: same-signature buckets give candidates via equi-join.
    */
  def lshSignature(df: DataFrame, idCol: String, vecCol: String,
                   nPlanes: Int, dims: Int): DataFrame = {
    val sigBits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(col(vecCol),
          transform(sequence(lit(0), lit(dims - 1)),
            d => planeComponent(p, d.cast("string"))),
          (x, w) => x * w),
        lit(0.0d), (acc, v) => acc + v)
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }
    df.select(col(idCol), concat(sigBits: _*).as("lsh_sig"))
  }

  /** Bucketed ANN: candidates share the LSH signature; exact cosine is
    * computed only within buckets.
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              nPlanes: Int, dims: Int, k: Int): DataFrame = {
    val sigs = lshSignature(corpus, idCol, vecCol, nPlanes, dims)
    val withSig = corpus.join(sigs, idCol)
    val a = withSig.select(col("lsh_sig"), col(idCol).as("qid"), col(vecCol).as("qv"))
    val b = withSig.select(col("lsh_sig"), col(idCol).as("cid"), col(vecCol).as("cv"))
    val scored = a.join(b, Seq("lsh_sig")).filter(col("qid") < col("cid"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 3))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("cos"))
  }
}
