package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture merge: apply an (insert/update/delete) change
  * stream to produce the latest-wins table state — the materialize step
  * of every log-shipped database replica (the reference ships such
  * streams via its kafka/forward inputs; this operator is the
  * downstream MERGE).
  *
  * Latest version per key = max over a (seq, op, payload) struct —
  * ONE aggregate with map-side partial combine (the struct max is
  * associative), no window, no sort; deletes drop after the fold so a
  * delete followed by nothing erases the key. Sequence numbers are the
  * total order; ties are impossible by contract (a replica's log has
  * one op per key per seq).
  */
object Cdc {

  /** @param changes (key, seq, op, payload) rows; op 'D' deletes
    * @return one row per surviving key with its latest seq and payload
    */
  def merge(changes: DataFrame, key: Column, seq: Column, op: Column,
            payload: Column): DataFrame =
    changes.select(key.as("key"),
        struct(seq.as("seq"), op.as("op"), payload.as("payload")).as("v"))
      .groupBy(col("key"))
      .agg(max(col("v")).as("v"))
      .filter(col("v.op") =!= "D")
      .select(col("key"), col("v.seq").as("seq"),
        col("v.payload").as("payload"))
}
