package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: the fact side tags each row with a
  * deterministic salt (md5 of a row id, mod `salt`), the dimension side
  * replicates each row `salt` times, and the join key becomes
  * (key, salt) — a hot key's rows spread over `salt` reduce partitions
  * instead of landing on one. Result set is EXACTLY the plain join's
  * (every fact row still meets every matching dim row exactly once,
  * through its own salt lane).
  *
  * This is the classic pre-AQE skew pattern, kept as a first-class
  * operator because AQE's skew-join split only covers sort-merge joins
  * on shuffle boundaries it can observe — a salted key works in any
  * join strategy and composes with bucketing. Cost: the dim side grows
  * ×salt (broadcast- or dim-sized — cheap); the fact side gains one
  * narrow column.
  */
object SkewJoin {

  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
                 dimKey: Column, factRowId: Column,
                 salt: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      org.apache.spark.sql.graftshim.shim.column(
        graft.functions.Md5Mod(
          org.apache.spark.sql.graftshim.shim.expression(factRowId),
          salt)))
    val saltedDim = dim.withColumn("_dsalt",
      explode(typedLit((0 until salt).map(_.toLong))))
    saltedFact.join(saltedDim,
        factKey === dimKey && col("_salt") === col("_dsalt"))
      .drop("_salt", "_dsalt")
  }
}
