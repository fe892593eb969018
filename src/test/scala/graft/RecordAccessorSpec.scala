package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.route.RecordAccessor
import graft.route.RecordAccessor._

/** Record-accessor grammar + translate semantics against the reference's
  * own test patterns (tests/internal/record_accessor.c cb_keys,
  * cb_translate, cb_translate_tag and the pattern list at :81-120).
  */
class RecordAccessorSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("parse: reference cb_keys patterns and part counts") {
    assert(parse("$aaa['a'] extra $bbb['b'] final access") == Seq(
      KeyRef("aaa", Seq(SubKey("a"))), Literal(" extra "),
      KeyRef("bbb", Seq(SubKey("b"))), Literal(" final access")))
    assert(parse("$b['x']['y']") == Seq(KeyRef("b", Seq(SubKey("x"), SubKey("y")))))
    assert(parse("$z") == Seq(KeyRef("z", Nil)))
    assert(parse("abc") == Seq(Literal("abc")))
    assert(parse("$kubernetes[2]['annotations']['fluentbit.io/tag']") == Seq(
      KeyRef("kubernetes", Seq(SubIndex(2), SubKey("annotations"),
        SubKey("fluentbit.io/tag")))))
    assert(parse("$matrix[1][2]") == Seq(KeyRef("matrix", Seq(SubIndex(1), SubIndex(2)))))
    assert(parse("$TAG[0]-${SVC}-$id") == Seq(TagRef(Some(0)), Literal("-"),
      EnvRef("SVC"), Literal("-"), KeyRef("id", Nil)))
    // $TAGS is a key named TAGS, not $TAG + literal "S"
    assert(parse("$TAGS") == Seq(KeyRef("TAGS", Nil)))
  }

  test("translate: the reference cb_translate format (env, nested, missing)") {
    val df = Seq(("string", true, false, 0.123456789, 123456789L))
      .toDF("k1", "k2", "k3", "k4", "k5")
      .withColumn("k6", struct(struct(lit("nested").as("s2")).as("s1")))
    val fmt = "START k1 => \"$k1\", k2 => $k2 (bool), k3 => $k3 (bool), " +
      "k4 => $k4 (float), k5 => $k5 (int)," +
      "k6 => $k6['s1']['s2'] (nested), k8 => $k8 (nothing), ${FLB_ENV} END"
    val out = df.select(RecordAccessor.translate(df, fmt,
      env = Map("FLB_ENV" -> "translated").get _).as("t")).as[String].head()
    // float renders full precision (reference C %f trims to 6 decimals —
    // documented divergence); everything else matches cb_translate.
    assert(out == "START k1 => \"string\", k2 => true (bool), k3 => false (bool), " +
      "k4 => 0.123456789 (float), k5 => 123456789 (int)," +
      "k6 => nested (nested), k8 =>  (nothing), translated END")
  }

  test("array index refs and $TAG parts resolve; map keys upsert") {
    val df = Seq((Seq(Seq(1, 2, 3), Seq(4, 5, 6)), "aa.bb.cc"))
      .toDF("matrix", "tag")
    assert(df.select(RecordAccessor.column(df, "$matrix[1][2]").as("v")).as[Int].head() == 6)
    assert(df.select(RecordAccessor.translate(df, "part=$TAG[1]").as("t")).as[String].head() == "part=bb")
    assert(df.select(RecordAccessor.column(df, "$TAG", "tag").as("t")).as[String].head() == "aa.bb.cc")

    val m = Seq((1, Map("a" -> "x"))).toDF("id", "labels")
    val up = updateKv(m, "$labels['b']", lit("y"))
    assert(up.select(element_at(col("labels"), "b")).as[String].head() == "y")
    val top = updateKv(m, "$new_col", lit("v"))
    assert(top.columns.contains("new_col"))
  }

  test("updateKv writes into struct paths (flb_ra_update_kv_pair)") {
    val df = Seq((1, ("a", "b"))).toDF("id", "nest")
      .withColumn("nest", struct(lit("a").as("x"), lit("b").as("y")))
    val up = updateKv(df, "$nest['x']", lit("Z"))
    assert(up.select(col("nest.x")).as[String].head() == "Z")
    // append: a leaf that did not exist
    val app = updateKv(df, "$nest['z']", lit("new"))
    assert(app.select(col("nest.z")).as[String].head() == "new")
    // a field name containing dots is ONE field, not nesting
    val dotted = updateKv(df, "$nest['fluentbit.io/tag']", lit("t"))
    assert(dotted.select(col("nest").getField("fluentbit.io/tag"))
      .as[String].head() == "t")
  }
}
