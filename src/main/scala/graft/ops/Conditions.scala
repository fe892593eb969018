package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The processor condition framework (reference
  * `src/flb_conditionals.c`, rules `flb_conditionals.h:55-64`): eq, neq,
  * gt, lt, gte, lte, regex, not_regex, in, not_in over record-accessor
  * paths, combined with AND/OR (`flb_conditionals.h:50-51`). A unit's
  * condition gates whether the processor runs for a record — in Spark
  * the compiled Column gates `when(...)`/`filter(...)`.
  *
  * NULL semantics follow the reference: a missing field fails the
  * condition (never errors), so every rule is coalesced to false.
  */
object Conditions {

  sealed trait Op
  case object Eq extends Op
  case object Neq extends Op
  case object Gt extends Op
  case object Lt extends Op
  case object Gte extends Op
  case object Lte extends Op
  case object Regex extends Op
  case object NotRegex extends Op
  case object In extends Op
  case object NotIn extends Op

  final case class Rule(field: Column, op: Op, value: Any)

  def compile(r: Rule): Column = {
    def listValue: Seq[Any] = r.value match {
      case s: Seq[_] => s
      case other => throw new IllegalArgumentException(
        s"in/not_in condition needs a list value, got ${if (other == null) "null" else other.getClass.getSimpleName}: $other")
    }
    val c = r.op match {
      case Eq => r.field === lit(r.value)
      case Neq => r.field =!= lit(r.value)
      case Gt => r.field > lit(r.value)
      case Lt => r.field < lit(r.value)
      case Gte => r.field >= lit(r.value)
      case Lte => r.field <= lit(r.value)
      case Regex => r.field.rlike(r.value.toString)
      case NotRegex => !r.field.rlike(r.value.toString)
      case In => r.field.isin(listValue: _*)
      case NotIn => !r.field.isin(listValue: _*)
    }
    coalesce(c, lit(false))
  }

  /** AND/OR combination of a rule list (flb_conditionals.h:50-51). An
    * empty rule list passes everything — a processor unit with no
    * condition always runs (flb_processor.h:69-84).
    */
  def combine(rules: Seq[Rule], operator: String = "and"): Column =
    operator.toLowerCase match {
      case "and" => rules.map(compile).reduceOption(_ && _).getOrElse(lit(true))
      case "or" => rules.map(compile).reduceOption(_ || _).getOrElse(lit(true))
      case other => throw new IllegalArgumentException(s"condition operator $other")
    }
}
