package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gated query: a Spark plan builder plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names MUST match between the two — the driver sorts
  * columns by name before hashing values.
  *
  * Determinism rules for oracle-matched queries (floating point must be
  * bit-identical between Spark and DuckDB):
  *   - sums of doubles go through DECIMAL casts (exact), then one cast to
  *     DOUBLE at the end (correctly rounded in both engines);
  *   - averages are `CAST(decimal_sum AS DOUBLE) / count` (IEEE division of
  *     identical operands);
  *   - event timestamps use integer nanoseconds (`ts_ns` in Spark,
  *     `epoch_ns(ts)` in DuckDB) — never double seconds;
  *   - unordered LIMIT is never used; top-k always has a total order.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Registry {
  def all: Seq[GraftQuery] =
    SpQueries.all ++ OpsQueries.all ++ OpsQueries2.all ++ ParseQueries.all ++
      FqlQueries.all ++ ExtQueries.all ++ IngestQueries.all ++
      SaasQueries.all ++ SaasQueries2.all ++ SaasQueries3.all ++
      ObsQueries.all ++ SearchQueries.all ++ OlapQueries.all ++
      OlapQueries2.all ++
      TsQueries.all ++ AnalyticsQueries.all ++ CurateQueries.all ++
      CurateQueries2.all ++ StreamQueries.all ++ ConfigQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
