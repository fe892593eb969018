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
