package graft.sql

/** AST for FluentQL — the reference's stream-processor SQL dialect
  * (grammar `src/stream_processor/parser/sql.y:106-161`, AST builder
  * `parser/flb_sp_parser.c:360`). Expression node kinds mirror
  * `include/fluent-bit/stream_processor/flb_sp_parser.h:70-95`.
  */
object Ast {

  sealed trait Expr
  /** `key` or `key['a']['b']` subkey path (flb_sp_key.c:98-166). */
  final case class Key(path: Seq[String]) extends Expr
  final case class IntLit(v: Long) extends Expr
  final case class FloatLit(v: Double) extends Expr
  final case class StrLit(v: String) extends Expr
  final case class BoolLit(v: Boolean) extends Expr
  case object NullLit extends Expr
  /** ops: EQ NEQ LT LTE GT GTE (flb_sp.c:828-998). */
  final case class Cmp(op: String, l: Expr, r: Expr) extends Expr
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  final case class IsNull(e: Expr, negated: Boolean) extends Expr
  /** `@record.contains(key)` / `@record.time()` (sql.y:363-373). */
  final case class RecordFunc(name: String, arg: Option[Key]) extends Expr
  /** NOW() / UNIX_TIMESTAMP() / RECORD_TAG() / RECORD_TIME()
    * (flb_sp_func_time.c, flb_sp_func_record.c).
    */
  final case class TimeFunc(name: String) extends Expr

  sealed trait SelectItem
  case object Star extends SelectItem
  final case class ExprItem(e: Expr, alias: Option[String]) extends SelectItem
  /** AVG/SUM/COUNT/MIN/MAX/TIMESERIES_FORECAST (flb_sp_aggregate_func.c).
    * `arg=None` ⇔ COUNT(*); `horizon` is the forecast's +n seconds.
    */
  final case class AggItem(func: String, arg: Option[Key], horizon: Option[Long],
                           alias: Option[String]) extends SelectItem

  sealed trait Source
  final case class StreamSource(name: String) extends Source
  final case class TagSource(pattern: String) extends Source

  sealed trait WindowSpec
  final case class Tumbling(seconds: Long) extends WindowSpec
  final case class Hopping(seconds: Long, advanceSeconds: Long) extends WindowSpec

  sealed trait Stmt
  final case class Select(
      items: Seq[SelectItem],
      source: Source,
      window: Option[WindowSpec],
      where: Option[Expr],
      groupBy: Seq[Key],
      limit: Option[Int]
  ) extends Stmt
  /** CREATE STREAM name WITH (tag='t',...) AS select (flb_sp_stream.c:60). */
  final case class CreateStream(name: String, props: Map[String, String],
                                select: Select) extends Stmt
  /** CREATE SNAPSHOT / FLUSH SNAPSHOT (flb_sp_snapshot.c). */
  final case class CreateSnapshot(name: String, props: Map[String, String],
                                  select: Select) extends Stmt
  final case class FlushSnapshot(name: String, select: Select) extends Stmt
}
