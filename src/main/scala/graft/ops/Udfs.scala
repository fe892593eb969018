package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The engine's UDF surface — the Spark-native home of filter_lua's
  * callback contract (reference `plugins/filter_lua/lua.c:433`, contract
  * at :600-616): a per-record function receives (tag, ts, record) and
  * returns a code plus replacement record(s):
  *
  *   - code -1 → drop the record
  *   - code  0 → keep the original unchanged
  *   - code  1 → replace with the returned record(s) and timestamp
  *   - code  2 → replace record(s) but keep the original timestamp
  *
  * One input record may return several records (the lua split form) —
  * a UDTF; `Dataset.flatMap` is the distributed mapping. Records are the
  * schemaless `Map[String,String]` body form (SURVEY §1.4 residue tier).
  */
object LuaContract {

  final case class Record(tag: String, tsSec: Long, body: Map[String, String])

  /** Run a REAL user Lua script behind the contract via the in-repo
    * interpreter ([[Lua]]): the named function is called as
    * `fn(tag, timestamp, record)` with the record as a Lua table and
    * must return `(code, timestamp, record)` — exactly
    * `plugins/filter_lua/lua.c:433-616`, including the 1→N split form
    * (the returned record being a pure array of tables emits one
    * record per element).
    *
    * The script compiles once per task (transient lazy), so executors
    * never ship interpreter state — only the source string travels.
    */
  def script(source: String, function: String = "cb_filter"): Callback =
    new LuaScriptCallback(source, function)

  private final class LuaScriptCallback(source: String, function: String)
      extends ((String, Long, Map[String, String]) => (Int, Long, Seq[Map[String, String]]))
      with Serializable {
    import Lua._
    @transient private lazy val compiled = new Lua.Script(source)

    private def toTable(body: Map[String, String]): LTable = {
      val t = new LTable
      body.foreach { case (k, v) =>
        t.set(LStr(k), if (v == null) LNil else LStr(v))
      }
      t
    }

    private def toMap(t: LTable): Map[String, String] =
      t.entries.iterator.map { case (k, v) => tostr(k) -> tostr(v) }.toMap

    /** lua.c's split form: a pure array of tables → one record each. */
    private def records(v: LV): Seq[Map[String, String]] = v match {
      case t: LTable =>
        val n = t.arrayLen
        val isSplit = n > 0 && t.entries.size == n &&
          t.entries.valuesIterator.forall(_.isInstanceOf[LTable])
        if (isSplit)
          (1 to n).map(i => toMap(t.get(LNum(i)).asInstanceOf[LTable]))
        else Seq(toMap(t))
      case LNil => Seq.empty
      case other => throw err(s"filter must return a record table, got ${typeName(other)}")
    }

    def apply(tag: String, tsSec: Long,
              body: Map[String, String]): (Int, Long, Seq[Map[String, String]]) = {
      val rs = compiled.callFunction(function,
        Seq(LStr(tag), LNum(tsSec.toDouble), toTable(body)))
      val code = rs.headOption.flatMap(tonum).getOrElse(
        throw err("filter must return (code, ts, record)")).toInt
      val newTs = rs.drop(1).headOption.flatMap(tonum)
        .map(_.toLong).getOrElse(tsSec)
      val recv = rs.drop(2).headOption.getOrElse(LNil)
      (code, newTs, if (code <= 0) Seq.empty else records(recv))
    }
  }

  /** The callback: (tag, tsSec, body) → (code, newTsSec, newBodies). */
  type Callback = (String, Long, Map[String, String]) => (Int, Long, Seq[Map[String, String]])

  def applyTo(spark: SparkSession, ds: Dataset[Record])(cb: Callback): Dataset[Record] = {
    import spark.implicits._
    ds.flatMap { r =>
      val (code, newTs, bodies) = cb(r.tag, r.tsSec, r.body)
      code match {
        case -1 => Nil
        case 0 => Seq(r)
        case 1 => bodies.map(b => Record(r.tag, newTs, b))
        case 2 => bodies.map(b => Record(r.tag, r.tsSec, b))
        case other => throw new IllegalArgumentException(s"lua contract code $other")
      }
    }
  }

  /** DataFrame adapter: lift (tagCol, tsSecCol, mapCol) through the
    * callback and back.
    */
  def applyToFrame(spark: SparkSession, df: DataFrame, tagCol: String,
                   tsSecCol: String, bodyCol: String)(cb: Callback): DataFrame = {
    import spark.implicits._
    val ds = df.select(tagCol, tsSecCol, bodyCol).as[(String, Long, Map[String, String])]
      .map { case (t, ts, b) => Record(t, ts, b) }
    applyTo(spark, ds)(cb).toDF("tag", "tsSec", "body")
      .withColumnRenamed("tsSec", tsSecCol)
      .withColumnRenamed("tag", tagCol)
      .withColumnRenamed("body", bodyCol)
  }
}
