package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** processor_content_modifier (reference
  * `plugins/processor_content_modifier/cm.h:34-41`, dispatch
  * cm_config.c:27-60): insert / upsert / delete / rename / hash (SHA-256)
  * / extract (regex groups → new keys) / convert, on body or metadata,
  * optionally gated by a condition (flb_conditionals.h:55-64).
  *
  * All actions are single Catalyst expressions (sha2, regexp_extract,
  * cast) — whole-stage-codegen friendly.
  */
object ContentModifier {

  def insert(df: DataFrame, key: String, value: Column, cond: Option[Column] = None): DataFrame =
    if (df.columns.contains(key)) df
    else df.withColumn(key, gate(cond, value))

  def upsert(df: DataFrame, key: String, value: Column, cond: Option[Column] = None): DataFrame = {
    val orig = if (df.columns.contains(key)) col(key) else lit(null)
    df.withColumn(key, cond.map(c => when(c, value).otherwise(orig)).getOrElse(value))
  }

  def delete(df: DataFrame, key: String): DataFrame = df.drop(key)

  def rename(df: DataFrame, from: String, to: String): DataFrame =
    df.withColumnRenamed(from, to)

  /** SHA-256 of the field's string form, hex-encoded — cm.h action hash. */
  def hash(df: DataFrame, key: String): DataFrame =
    df.withColumn(key, sha2(col(key).cast("string"), 256))

  /** Extract regex groups into new columns. The reference uses named
    * groups (`?<name>`); Spark's regexp_extract is positional, so the
    * caller supplies group-index→column-name.
    */
  def extract(df: DataFrame, source: Column, pattern: String,
              groups: Seq[(Int, String)]): DataFrame =
    groups.foldLeft(df) { case (d, (idx, name)) =>
      d.withColumn(name, regexp_extract(source, pattern, idx))
    }

  def convert(df: DataFrame, key: String, to: String): DataFrame =
    df.withColumn(key, col(key).try_cast(to))

  private def gate(cond: Option[Column], value: Column): Column =
    cond.map(c => when(c, value).otherwise(lit(null))).getOrElse(value)
}

/** processor_metrics_selector (reference
  * `plugins/processor_metrics_selector/selector.c:80-126`): keep/delete
  * metrics by name — exact, regex (`/.../`), prefix, or substring.
  */
object MetricsSelector {
  sealed trait Mode
  case object Include extends Mode
  case object Exclude extends Mode

  def apply(df: DataFrame, nameCol: Column, pattern: String, mode: Mode,
            opType: String = "exact"): DataFrame = {
    val m: Column = opType match {
      case _ if pattern.length > 1 && pattern.startsWith("/") && pattern.endsWith("/") =>
        nameCol.rlike(pattern.substring(1, pattern.length - 1))
      case "prefix" => nameCol.startsWith(pattern)
      case "substring" => nameCol.contains(pattern)
      case _ => nameCol === pattern
    }
    df.filter(if (mode == Include) m else !m)
  }
}
