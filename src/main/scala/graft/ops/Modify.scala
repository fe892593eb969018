package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** filter_modify (reference `plugins/filter_modify/modify.h:28-53`, exec
  * modify.c:1486): RENAME / HARD_RENAME / ADD / SET / REMOVE /
  * REMOVE_WILDCARD / REMOVE_REGEX / COPY / HARD_COPY, gated by
  * KEY_EXISTS / KEY_VALUE_EQUALS / ... conditions.
  *
  * Spark mapping: fluent-bit records are schemaless, Spark schemas are
  * fixed — so *structural* rules (rename/remove/copy) act on columns
  * (whole-DataFrame), while *value* rules (SET) are per-row `when(...)`
  * expressions gated by the condition. Wildcard/regex key rules target
  * either column names or a MAP<STRING,STRING> residue column via
  * `map_filter` (codegen'd higher-order function, no UDF).
  */
object Modify {

  sealed trait Rule
  /** RENAME: no-op if `to` already exists (HARD_RENAME overwrites). */
  final case class Rename(from: String, to: String, hard: Boolean = false) extends Rule
  /** ADD: only if key absent; SET overwrites. */
  final case class Add(key: String, value: Column) extends Rule
  final case class Set(key: String, value: Column) extends Rule
  final case class Remove(key: String) extends Rule
  final case class RemoveWildcard(prefix: String) extends Rule
  final case class RemoveRegex(pattern: String) extends Rule
  final case class Copy(from: String, to: String, hard: Boolean = false) extends Rule
  /** MOVE_TO_START / MOVE_TO_END (modify.h:38-39): reorder keys matching
    * a prefix wildcard to the front/back of the record.
    */
  final case class MoveToStart(prefix: String) extends Rule
  final case class MoveToEnd(prefix: String) extends Rule

  sealed trait Condition { def toColumn(df: DataFrame): Column }
  final case class KeyExists(key: String) extends Condition {
    def toColumn(df: DataFrame): Column =
      if (df.columns.contains(key)) col(key).isNotNull else lit(false)
  }
  final case class KeyValueEquals(key: String, value: String) extends Condition {
    def toColumn(df: DataFrame): Column =
      if (df.columns.contains(key)) col(key).cast("string") === value else lit(false)
  }
  final case class KeyValueMatches(key: String, pattern: String) extends Condition {
    def toColumn(df: DataFrame): Column =
      if (df.columns.contains(key)) coalesce(col(key).cast("string").rlike(pattern), lit(false))
      else lit(false)
  }

  def apply(df: DataFrame, rules: Seq[Rule], conditions: Seq[Condition] = Nil): DataFrame = {
    val gate: Option[Column] =
      if (conditions.isEmpty) None else Some(conditions.map(_.toColumn(df)).reduce(_ && _))
    rules.foldLeft(df) { (d, rule) =>
      rule match {
        case Rename(from, to, hard) =>
          if (!d.columns.contains(from)) d
          else if (d.columns.contains(to) && !hard) d
          else if (d.columns.contains(to)) d.drop(to).withColumnRenamed(from, to)
          else d.withColumnRenamed(from, to)
        case Add(key, value) =>
          if (d.columns.contains(key)) d
          else d.withColumn(key, gated(gate, value, lit(null)))
        case Set(key, value) =>
          val orig = if (d.columns.contains(key)) col(key) else lit(null)
          d.withColumn(key, gated(gate, value, orig))
        case Remove(key) => d.drop(key)
        case RemoveWildcard(prefix) =>
          d.drop(d.columns.filter(_.startsWith(prefix)).toIndexedSeq: _*)
        case RemoveRegex(pattern) =>
          d.drop(d.columns.filter(_.matches(pattern)).toIndexedSeq: _*)
        case Copy(from, to, hard) =>
          if (!d.columns.contains(from)) d
          else if (d.columns.contains(to) && !hard) d
          else d.withColumn(to, gated(gate, col(from), lit(null)))
        case MoveToStart(prefix) =>
          val (m, rest) = d.columns.partition(_.startsWith(prefix))
          d.select((m ++ rest).map(col).toIndexedSeq: _*)
        case MoveToEnd(prefix) =>
          val (m, rest) = d.columns.partition(_.startsWith(prefix))
          d.select((rest ++ m).map(col).toIndexedSeq: _*)
      }
    }
  }

  private def gated(gate: Option[Column], value: Column, orElse: Column): Column =
    gate.map(g => when(g, value).otherwise(orElse)).getOrElse(value)

  /** Map-residue variants for the schemaless part of a log record. */
  def mapRemoveWildcard(m: Column, prefix: String): Column =
    map_filter(m, (k, _) => !k.startsWith(prefix))
  def mapRemoveRegex(m: Column, pattern: String): Column =
    map_filter(m, (k, _) => !k.rlike(pattern))
  def mapSet(m: Column, key: String, value: Column): Column =
    map_concat(map_filter(m, (k, _) => k =!= key), map(lit(key), value))
}
