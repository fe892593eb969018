package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType, StructType}
import Ast._

/** Plans a FluentQL AST into a DataFrame pipeline. The reference
  * interprets its AST per record (`flb_sp.c:2007-2099` flb_sp_do); here
  * the AST is *compiled once* into a Catalyst logical plan, so Catalyst
  * does predicate pushdown/pruning and Tungsten does codegen — the whole
  * query runs without interpretation (SURVEY §3.2's "Spark equivalent").
  *
  * Batch semantics (deterministic, DuckDB-checkable):
  *   - windows are event-time over `conf.tsSecCol` (the reference's
  *     wall-clock timers are nondeterministic — SURVEY §7.4(2));
  *     windowed output carries a `wstart` column (extension: the
  *     reference emits bare aggregates per timer fire);
  *   - no window + aggregates ⇒ whole-input aggregation (reference:
  *     per-chunk, S14);
  *   - COUNT(key) counts records, not non-null values — faithful to
  *     `aggregate_func_add_count` being a records counter (S7);
  *   - string↔number coercion: comparisons against numeric literals
  *     try_cast the key side to double (flb_sp.c:298-400, the
  *     `stream_processor_str_conv` behavior); mismatch ⇒ NULL ⇒ false.
  */
object Planner {

  /** Binds stream names to DataFrames — the engine's stream catalog
    * (reference: input-instance name lookup, flb_sp.c:157-182).
    */
  final case class Catalog(
      streams: Map[String, DataFrame],
      tagCol: String = "tag",
      tsSecCol: String = "ts_sec",
      /** Stream TAG:'pat' sources select from. */
      defaultStream: Option[String] = None,
      /** Event-time column + watermark used when a WINDOW query binds to
        * a STREAMING DataFrame (batch windows use tsSecCol arithmetic).
        */
      tsCol: String = "ts",
      watermark: String = "1 minute"
  ) {
    def stream(name: String): DataFrame =
      streams.getOrElse(name, throw new ParseException(s"unknown stream $name"))
    def all: DataFrame = defaultStream.map(stream).getOrElse(
      streams.values.reduce(_ unionByName _))

    /** Expose every catalog stream as a temp view (in each frame's own
      * session) so full Spark SQL — JOIN, ORDER BY, HAVING, subqueries,
      * set ops: the dialect gaps SURVEY §2.1 lists for the reference
      * grammar — runs over the same streams as native extensions:
      * `spark.sql("SELECT ... FROM s1 JOIN s2 ...")`.
      */
    def registerViews(): Unit =
      streams.foreach { case (name, df) => df.createOrReplaceTempView(name) }
  }

  /** Epoch base for forecast regression math — keeps x² sums inside
    * exact int64/decimal range (see SpQueries.s09_forecast).
    */
  private val X0 = 1704067200L

  def plan(sql: String, catalog: Catalog): DataFrame =
    plan(Parser.parse(sql), catalog)

  def plan(stmt: Stmt, catalog: Catalog): DataFrame = stmt match {
    case s: Select => planSelect(s, catalog)
    case CreateStream(_, props, sel) =>
      // Re-tag (flb_sp_stream.c:60-152): result becomes a new stream;
      // batch form returns the re-tagged DataFrame (caller registers it).
      val out = planSelect(sel, catalog)
      props.get("tag") match {
        case Some(t) => out.withColumn(catalog.tagCol, lit(t))
        case None => out
      }
    case CreateSnapshot(_, props, sel) =>
      // Bounded ring buffer (flb_sp_snapshot.c:25-180): batch analogue
      // keeps the newest `seconds` span / LIMIT rows per tag.
      val base = planSelect(sel, catalog)
      props.get("seconds") match {
        case Some(secs) =>
          // Lazy scalar join — no Spark job at plan-build time. The max
          // is a 1-row broadcast folded into the same DAG (the source
          // subtree appears twice; exchange reuse typically dedupes it).
          val maxTs = base.agg(max(col(catalog.tsSecCol)).as("__max_ts"))
          base.crossJoin(broadcast(maxTs))
            .filter(col(catalog.tsSecCol) > col("__max_ts") - secs.toLong)
            .drop("__max_ts")
        case None => base
      }
    case FlushSnapshot(_, sel) => planSelect(sel, catalog)
  }

  def planSelect(sel: Select, catalog: Catalog): DataFrame = {
    val src = sel.source match {
      case StreamSource(name) => catalog.stream(name)
      case TagSource(pat) =>
        catalog.all.filter(graft.route.Router.tagMatch(col(catalog.tagCol), pat))
    }

    val filtered = sel.where match {
      case Some(cond) => src.filter(coalesce(predicate(cond, src, catalog), lit(false)))
      case None => src
    }

    val aggItems = sel.items.collect { case a: AggItem => a }
    val isAgg = aggItems.nonEmpty || sel.groupBy.nonEmpty

    val projected =
      if (!isAgg) {
        val cols = sel.items.flatMap {
          case Star => filtered.columns.toSeq.map(col)
          case ExprItem(e, alias) =>
            val c = exprColumn(e, filtered, catalog)
            Seq(alias.map(c.as).getOrElse(c.as(defaultName(e))))
          case _: AggItem => Nil
        }
        filtered.select(cols: _*)
      } else {
        planAggregate(sel, filtered, catalog)
      }

    sel.limit.map(projected.limit).getOrElse(projected)
  }

  private def planAggregate(sel: Select, filtered: DataFrame,
                            catalog: Catalog): DataFrame = {
    // Non-aggregated select keys must be grouped (flb_sp.c:232-289) —
    // Catalyst would also reject, but fail with the reference's message.
    val bareKeys = sel.items.collect { case ExprItem(k: Key, a) => (k, a) }
    bareKeys.foreach { case (k, _) =>
      if (!sel.groupBy.contains(k))
        throw new ParseException(s"key ${k.path.mkString(".")} must appear in GROUP BY")
    }

    // Streaming source + WINDOW ⇒ event-time window() with a watermark
    // (append-able, state bounded); batch ⇒ epoch-bucket arithmetic that
    // the DuckDB oracles can mirror exactly.
    val streamingWin = filtered.isStreaming && sel.window.isDefined

    val groupCols: Seq[(Column, String)] =
      sel.window.map { w =>
        (w, streamingWin) match {
          case (Tumbling(n), false) =>
            Seq((expr(s"(${catalog.tsSecCol} div $n) * $n").cast("long"), "wstart"))
          case (Hopping(_, _), false) => // handled via pre-explode below
            Seq((col("__wstart"), "wstart"))
          case (Tumbling(n), true) =>
            Seq((window(col(catalog.tsCol), s"$n seconds"), "window"))
          case (Hopping(n, adv), true) =>
            Seq((window(col(catalog.tsCol), s"$n seconds", s"$adv seconds"), "window"))
        }
      }.getOrElse(Nil) ++
        sel.groupBy.map(k => (keyColumn(k, filtered, catalog), k.path.last))

    val exploded = sel.window match {
      case Some(Hopping(n, adv)) if !streamingWin =>
        val slots = (n / adv).toInt
        filtered
          .withColumn("__slot", explode(array((0 until slots).map(i => lit(i.toLong)): _*)))
          .withColumn("__wstart",
            (expr(s"(${catalog.tsSecCol} - __slot * $adv) div $n") * n +
              col("__slot") * adv).cast("long"))
      case _ if streamingWin => filtered.withWatermark(catalog.tsCol, catalog.watermark)
      case _ => filtered
    }

    // Forecast needs auxiliary exact sums; other aggs are single exprs.
    val aggExprs = scala.collection.mutable.ArrayBuffer[Column]()
    val finals = scala.collection.mutable.ArrayBuffer[(Column, String)]()
    var fidx = 0
    sel.items.foreach {
      case ExprItem(k: Key, aliasOpt) =>
        val n0 = aliasOpt.getOrElse(k.path.last)
        finals += ((col(n0), n0))
      case ExprItem(e, aliasOpt) =>
        val n1 = aliasOpt.getOrElse(defaultName(e))
        finals += ((exprColumn(e, exploded, catalog).as(n1), n1))
      case Star => throw new ParseException("SELECT * cannot combine with aggregates")
      case AggItem(func, argOpt, horizon, aliasOpt) =>
        val name = aliasOpt.getOrElse(
          s"${func.toLowerCase}_${argOpt.map(_.path.last).getOrElse("star")}")
        func match {
          case "COUNT" =>
            aggExprs += count(lit(1)).as(name)
            finals += ((col(name), name))
          case "MIN" | "MAX" | "SUM" =>
            val c = numericKey(argOpt.get, exploded, catalog)
            aggExprs += (func match {
              case "MIN" => min(c); case "MAX" => max(c); case _ => sum(c)
            }).as(name)
            finals += ((col(name), name))
          case "AVG" =>
            // reference AVG = sum/records (flb_sp_aggregate_func.c:170-184)
            val c = numericKey(argOpt.get, exploded, catalog)
            aggExprs += sum(c).as(s"__sum$fidx")
            aggExprs += count(lit(1)).as(s"__n$fidx")
            finals += (((col(s"__sum$fidx").cast("double") / col(s"__n$fidx")).as(name), name))
            fidx += 1
          case "TIMESERIES_FORECAST" =>
            // linear regression over (record-time, value), predict at
            // latest_x + horizon (flb_sp_aggregate_func.c:223-292);
            // exact sums => bit-deterministic slope/intercept.
            val y = numericKey(argOpt.get, exploded, catalog).cast("decimal(18,2)")
            val x = (col(catalog.tsSecCol) - lit(X0)).cast("long")
            val i = fidx
            aggExprs += count(lit(1)).as(s"__fn$i")
            aggExprs += sum(x).as(s"__fsx$i")
            aggExprs += sum(y).as(s"__fsy$i")
            aggExprs += sum(x * y).as(s"__fsxy$i")
            aggExprs += sum(x * x).as(s"__fsxx$i")
            aggExprs += max(x).as(s"__fmx$i")
            val nD = col(s"__fn$i").cast("double")
            val sx = col(s"__fsx$i").cast("double")
            val sy = col(s"__fsy$i").cast("double")
            val sxy = col(s"__fsxy$i").cast("double")
            val sxx = col(s"__fsxx$i").cast("double")
            val slope = (nD * sxy - sx * sy) / (nD * sxx - sx * sx)
            val intercept = (sy - slope * sx) / nD
            finals += (((intercept + slope * (col(s"__fmx$i").cast("double") +
              lit(horizon.getOrElse(0L).toDouble))).as(name), name))
            fidx += 1
          case other => throw new ParseException(s"unknown aggregate $other")
        }
    }

    if (aggExprs.isEmpty) // SELECT k ... GROUP BY k ⇒ distinct group keys
      return exploded.select(groupCols.map { case (c, n) => c.as(n) }: _*).distinct()

    val grouped =
      if (groupCols.isEmpty) exploded.agg(aggExprs.head, aggExprs.tail.toSeq: _*)
      else exploded
        .groupBy(groupCols.map { case (c, n) => c.as(n) }: _*)
        .agg(aggExprs.head, aggExprs.tail.toSeq: _*)

    // output: group keys (window first), then select-ordered items;
    // streaming window struct flattens to epoch-second wstart
    val keyOut = groupCols.map {
      case (_, "window") =>
        unix_timestamp(col("window.start")).as("wstart")
      case (_, n) => col(n)
    }
    val keyNames = groupCols.map(_._2).toSet
    val finalOut = finals.filterNot { case (_, n) => keyNames.contains(n) }.map(_._1)
    grouped.select((keyOut ++ finalOut).toSeq: _*)
  }

  // ------------------------------------------------------------ accessors

  /** Resolve `key['a']['b']` against the stream's schema: struct path,
    * map lookup, or JSON-string residue (SURVEY §1.4 two-tier model);
    * missing key ⇒ NULL (matches flb_sp_key.c semantics).
    */
  def keyColumn(k: Key, df: DataFrame, catalog: Catalog): Column = {
    val base = k.path.head
    if (!df.columns.contains(base)) return lit(null)
    if (k.path.size == 1) return col(base)
    df.schema(base).dataType match {
      case _: StructType => col(k.path.mkString("."))
      case _: MapType =>
        k.path.tail.foldLeft(col(base))((c, p) => element_at(c, p))
      case StringType =>
        get_json_object(col(base), "$." + k.path.tail.mkString("."))
      case _ => lit(null)
    }
  }

  private def numericKey(k: Key, df: DataFrame, catalog: Catalog): Column = {
    val c = keyColumn(k, df, catalog)
    df.select(c.as("__t")).schema.head.dataType match {
      case StringType =>
        // Spark orders NaN above every double ('NaN' > x ⇒ true); the
        // reference's C comparison on a NaN operand is false — coerce
        // NaN to NULL so it compares false (found by CoercionSpec).
        // nanvl evaluates the cast once (a when(!isnan(d), d) pair
        // evaluated it twice per row).
        nanvl(c.try_cast("double"), lit(null).cast("double"))
      case _ => c
    }
  }

  private def defaultName(e: Expr): String = e match {
    case Key(path) => path.last
    case TimeFunc(n) => n.toLowerCase
    case _ => "expr"
  }

  // ----------------------------------------------------------- predicates

  def predicate(e: Expr, df: DataFrame, catalog: Catalog): Column = e match {
    case And(l, r) =>
      coalesce(predicate(l, df, catalog), lit(false)) &&
        coalesce(predicate(r, df, catalog), lit(false))
    case Or(l, r) =>
      coalesce(predicate(l, df, catalog), lit(false)) ||
        coalesce(predicate(r, df, catalog), lit(false))
    case Not(x) => !coalesce(predicate(x, df, catalog), lit(false))
    case IsNull(k: Key, negated) =>
      val c = keyColumn(k, df, catalog)
      if (negated) c.isNotNull else c.isNull
    case IsNull(x, negated) =>
      val c = exprColumn(x, df, catalog)
      if (negated) c.isNotNull else c.isNull
    case RecordFunc("contains", Some(k)) => keyColumn(k, df, catalog).isNotNull
    case RecordFunc("time", None) => col(catalog.tsSecCol).isNotNull
    case Cmp(op, l, r) => cmp(op, l, r, df, catalog)
    case k: Key => // bare key: truthy = exists and not false
      val c = keyColumn(k, df, catalog)
      c.isNotNull && coalesce(c.cast("string") =!= "false", lit(true))
    case BoolLit(b) => lit(b)
    case other => throw new ParseException(s"bad predicate $other")
  }

  private def cmp(op: String, l: Expr, r: Expr, df: DataFrame, catalog: Catalog): Column = {
    val (lc, rc) = coerce(l, r, df, catalog)
    op match {
      case "==" => lc === rc
      case "!=" => lc =!= rc
      case "<" => lc < rc
      case "<=" => lc <= rc
      case ">" => lc > rc
      case ">=" => lc >= rc
    }
  }

  /** Lazy string→number coercion (flb_sp.c:298-400 object_to_number +
    * :799-826): a key compared to a numeric literal is coerced to double
    * (unparseable ⇒ NULL ⇒ false); to a string literal ⇒ string compare;
    * to a bool ⇒ boolean cast.
    */
  private def coerce(l: Expr, r: Expr, df: DataFrame,
                     catalog: Catalog): (Column, Column) = (l, r) match {
    case (k: Key, IntLit(v)) => (numericKey(k, df, catalog), lit(v))
    case (k: Key, FloatLit(v)) => (numericKey(k, df, catalog), lit(v))
    case (IntLit(v), k: Key) => (lit(v), numericKey(k, df, catalog))
    case (FloatLit(v), k: Key) => (lit(v), numericKey(k, df, catalog))
    case (k: Key, StrLit(s)) => (keyColumn(k, df, catalog).cast("string"), lit(s))
    case (StrLit(s), k: Key) => (lit(s), keyColumn(k, df, catalog).cast("string"))
    case (k: Key, BoolLit(b)) => (keyColumn(k, df, catalog).cast("boolean"), lit(b))
    case (BoolLit(b), k: Key) => (lit(b), keyColumn(k, df, catalog).cast("boolean"))
    case (a, b) => (exprColumn(a, df, catalog), exprColumn(b, df, catalog))
  }

  def exprColumn(e: Expr, df: DataFrame, catalog: Catalog): Column = e match {
    case k: Key => keyColumn(k, df, catalog)
    case IntLit(v) => lit(v)
    case FloatLit(v) => lit(v)
    case StrLit(s) => lit(s)
    case BoolLit(b) => lit(b)
    case NullLit => lit(null)
    case TimeFunc("NOW") => date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss")
    case TimeFunc("UNIX_TIMESTAMP") => unix_timestamp()
    case TimeFunc("RECORD_TAG") => col(catalog.tagCol)
    case TimeFunc("RECORD_TIME") => col(catalog.tsSecCol).cast("double")
    // @record.time() as a comparison operand (sql.y:370-373)
    case RecordFunc("time", None) => col(catalog.tsSecCol).cast("double")
    case other => throw new ParseException(s"cannot project $other")
  }
}

/** Facade: `FluentQL.sql("SELECT ... FROM STREAM:events ...")`. */
object FluentQL {
  def sql(query: String, catalog: Planner.Catalog): DataFrame =
    Planner.plan(query, catalog)
}
