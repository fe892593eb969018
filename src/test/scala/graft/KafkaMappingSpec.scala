package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.KafkaMapping

/** The Kafka transport's testable surface without the connector jar:
  * config translation and the frame adapters (the connector itself is
  * exercised only on clusters that ship it).
  */
class KafkaMappingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("in_kafka config translates to reader options with passthrough") {
    val opts = KafkaMapping.sourceOptions(Map(
      "brokers" -> "b1:9092,b2:9092", "topics" -> "logs,metrics",
      "group_id" -> "graft", "client_id" -> "c1",
      "rdkafka.security.protocol" -> "SASL_SSL"))
    assert(opts("kafka.bootstrap.servers") == "b1:9092,b2:9092")
    assert(opts("subscribe") == "logs,metrics")
    assert(opts("kafka.group.id") == "graft")
    assert(opts("kafka.security.protocol") == "SASL_SSL")
    intercept[IllegalArgumentException] {
      KafkaMapping.sourceOptions(Map("brokers" -> "b"))
    }
  }

  test("kafka record frame adapts to the (tag, ts, record) model") {
    val ts = java.sql.Timestamp.valueOf("2024-01-02 03:04:05")
    val in = Seq(
      ("logs", ts, 0, 7L, "k1".getBytes, """{"msg":"boom","lvl":"e"}""".getBytes)
    ).toDF("topic", "timestamp", "partition", "offset", "key", "value")
    val out = KafkaMapping.fromKafkaFrame(in).collect()(0)
    assert(out.getAs[String]("tag") == "logs")
    assert(out.getAs[Long]("offset") == 7L)
    assert(out.getAs[String]("message_key") == "k1")
    assert(out.getAs[Map[String, String]]("record") ==
      Map("msg" -> "boom", "lvl" -> "e"))
    val raw = KafkaMapping.fromKafkaFrame(in, format = "none").collect()(0)
    assert(raw.getAs[String]("payload").contains("boom"))
  }

  test("engine frame adapts to the kafka writer frame") {
    val df = Seq(("app.web", Map("m" -> "1"))).toDF("tag", "record")
    val out = KafkaMapping.toKafkaFrame(df, col("tag"), col("record"),
      messageKey = Some(lit("k"))).collect()(0)
    assert(out.getAs[String]("topic") == "app.web")
    assert(out.getAs[String]("key") == "k")
    assert(out.getAs[String]("value") == """{"m":"1"}""")
  }
}
