package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{KafkaMapping, KafkaWire}
import graft.sources.KafkaWire.Record
import java.nio.charset.StandardCharsets.UTF_8

/** The Kafka transport: config translation, the frame adapters, and the
  * hand-rolled wire protocol (record batches v2, produce v3 / fetch v4)
  * driven end-to-end against a scripted in-memory broker over a real
  * socket — the same pattern as the MQTT/NATS/Forward wire tests.
  */
class KafkaMappingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Scripted broker: an append-only in-memory log speaking produce v3
    * and fetch v4 through [[KafkaWire]]'s server-side codecs. Assigns
    * real offsets by rewriting each appended batch's baseOffset (the 8
    * bytes the CRC deliberately excludes).
    */
  private final class ScriptedBroker extends AutoCloseable {
    private val server = new java.net.ServerSocket(0)
    val port: Int = server.getLocalPort
    // (topic, partition) -> appended (assignedBase, recordCount, bytes)
    private val log = scala.collection.mutable.Map[(String, Int),
      scala.collection.mutable.ArrayBuffer[(Long, Int, Array[Byte])]]()
    @volatile private var running = true

    private val thread = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          new Thread(() => serve(sock)).start()
        } catch { case _: Throwable => () }
      }
    })
    thread.setDaemon(true)
    thread.start()

    private def serve(sock: java.net.Socket): Unit = try {
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      while (true) {
        val size = in.readInt()
        val body = new Array[Byte](size)
        in.readFully(body)
        val apiKey = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
        val resp = apiKey match {
          case 0 =>
            val req = KafkaWire.parseProduceRequest(body)
            val recs = KafkaWire.decodeRecordBatches(req.recordSet)
            val q = log.synchronized {
              log.getOrElseUpdate((req.topic, req.partition),
                scala.collection.mutable.ArrayBuffer())
            }
            val base = q.synchronized {
              val next = q.lastOption.map(e => e._1 + e._2).getOrElse(0L)
              val stamped = req.recordSet.clone()
              java.nio.ByteBuffer.wrap(stamped).putLong(0, next)
              q += ((next, recs.length, stamped))
              next
            }
            KafkaWire.produceResponse(req.correlationId, req.topic,
              req.partition, 0, base)
          case 1 =>
            val req = KafkaWire.parseFetchRequest(body)
            val q = log.synchronized {
              log.getOrElse((req.topic, req.partition),
                scala.collection.mutable.ArrayBuffer())
            }
            val (hw, sets) = q.synchronized {
              (q.lastOption.map(e => e._1 + e._2).getOrElse(0L),
                q.filter { case (b, n, _) => b + n - 1 >= req.fetchOffset }
                  .map(_._3).toSeq)
            }
            KafkaWire.fetchResponse(req.correlationId, req.topic,
              req.partition, 0, hw,
              sets.foldLeft(Array.empty[Byte])(_ ++ _))
          case k => throw new IllegalArgumentException(s"api $k unsupported")
        }
        out.write(resp); out.flush()
      }
    } catch { case _: Throwable => () } finally sock.close()

    override def close(): Unit = { running = false; server.close() }
  }

  test("record batch v2 round-trips keys, values, headers, timestamps") {
    val recs = Seq(
      Record(0L, 1700000000000L, "k1".getBytes(UTF_8), "v1".getBytes(UTF_8),
        Seq("h1" -> "x".getBytes(UTF_8), "h2" -> null)),
      Record(0L, 1700000000123L, null, "v2".getBytes(UTF_8)),
      Record(0L, 1700000000050L, "k3".getBytes(UTF_8), null))
    val batch = KafkaWire.encodeRecordBatch(42L, recs)
    val out = KafkaWire.decodeRecordBatches(batch)
    assert(out.map(_.offset) == Seq(42L, 43L, 44L))
    assert(out.map(_.timestampMs) ==
      Seq(1700000000000L, 1700000000123L, 1700000000050L))
    assert(new String(out(0).key, UTF_8) == "k1")
    assert(out(0).headers.map(_._1) == Seq("h1", "h2"))
    assert(new String(out(0).headers.head._2, UTF_8) == "x")
    assert(out(0).headers(1)._2 == null)
    assert(out(1).key == null && new String(out(1).value, UTF_8) == "v2")
    assert(out(2).value == null)
    // two batches concatenate into one record set
    val both = batch ++ KafkaWire.encodeRecordBatch(45L,
      Seq(Record(0L, 5L, null, "tail".getBytes(UTF_8))))
    assert(KafkaWire.decodeRecordBatches(both).map(_.offset) ==
      Seq(42L, 43L, 44L, 45L))
  }

  test("batch integrity: crc flip, bad magic, trailing garbage rejected") {
    val batch = KafkaWire.encodeRecordBatch(0L,
      Seq(Record(0L, 1L, null, "x".getBytes(UTF_8))))
    val flipped = batch.clone()
    flipped(flipped.length - 1) = (flipped(flipped.length - 1) ^ 1).toByte
    val e = intercept[IllegalArgumentException] {
      KafkaWire.decodeRecordBatches(flipped)
    }
    assert(e.getMessage.contains("crc"))
    val badMagic = batch.clone()
    badMagic(16) = 1 // magic byte position
    intercept[IllegalArgumentException] {
      KafkaWire.decodeRecordBatches(badMagic)
    }
    intercept[IllegalArgumentException] {
      KafkaWire.decodeRecordBatches(batch ++ Array[Byte](1, 2, 3))
    }
  }

  test("compressed batches: gzip and zstd record sections decode") {
    // rebuild an uncompressed batch with codec attributes + compressed
    // records section (what a gzip/zstd-producing client would send)
    def recompress(batch: Array[Byte], codec: Int,
                   pack: Array[Byte] => Array[Byte]): Array[Byte] = {
      val recs = java.util.Arrays.copyOfRange(batch, 61, batch.length)
      val packed = pack(recs)
      val out = java.nio.ByteBuffer.allocate(61 + packed.length)
      out.put(java.util.Arrays.copyOfRange(batch, 0, 61))
      out.put(packed)
      out.putInt(8, 61 + packed.length - 12) // batchLength
      out.putShort(21, codec.toShort)        // attributes
      val arr = out.array()
      val c = new java.util.zip.CRC32C      // crc covers attributes-onward
      c.update(arr, 21, arr.length - 21)
      out.putInt(17, c.getValue.toInt)
      arr
    }
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val plain = KafkaWire.encodeRecordBatch(7L,
      Seq(Record(0L, 11L, "k".getBytes(UTF_8), ("v" * 100).getBytes(UTF_8)),
        Record(0L, 12L, null, "w".getBytes(UTF_8))))
    val want = KafkaWire.decodeRecordBatches(plain)
      .map(r => (r.offset, r.timestampMs, new String(r.value, UTF_8)))
    val gzBatch = recompress(plain, 1, gz)
    assert(KafkaWire.decodeRecordBatches(gzBatch)
      .map(r => (r.offset, r.timestampMs, new String(r.value, UTF_8))) == want)
    // zstd: the fixture is the SAME records section compressed by the
    // reference CLI (encodeRecordBatch is deterministic)
    val zstRecs = {
      val in = getClass.getResourceAsStream("/zstd/kafka_recs.zst")
      try in.readAllBytes() finally in.close()
    }
    val zstBatch = recompress(plain, 4, _ => zstRecs)
    assert(KafkaWire.decodeRecordBatches(zstBatch)
      .map(r => (r.offset, r.timestampMs, new String(r.value, UTF_8))) == want)
    // snappy (codec 2) has no in-repo decoder: rejected loudly
    val e = intercept[IllegalArgumentException] {
      KafkaWire.decodeRecordBatches(recompress(plain, 2, identity))
    }
    assert(e.getMessage.contains("codec"))
  }

  test("wire e2e: produce then fetch against the scripted broker") {
    val broker = new ScriptedBroker
    try {
      val cli = new KafkaWire.Client("127.0.0.1", broker.port)
      try {
        val r1 = cli.produce("logs", 0, Seq(
          Record(0L, 100L, "a".getBytes(UTF_8), "one".getBytes(UTF_8)),
          Record(0L, 101L, null, "two".getBytes(UTF_8))))
        assert(r1.baseOffset == 0L)
        val r2 = cli.produce("logs", 0, Seq(
          Record(0L, 102L, null, "three".getBytes(UTF_8))))
        assert(r2.baseOffset == 2L)
        // full fetch: offsets assigned by the broker survive decode
        val all = cli.fetch("logs", 0, 0L)
        assert(all.highWatermark == 3L)
        assert(all.records.map(r => (r.offset,
          new String(r.value, UTF_8))) ==
          Seq((0L, "one"), (1L, "two"), (2L, "three")))
        // mid-offset fetch returns only the covering batch
        val tail = cli.fetch("logs", 0, 2L)
        assert(tail.records.map(_.offset) == Seq(2L))
        // independent topics do not bleed
        cli.produce("metrics", 0, Seq(Record(0L, 1L, null,
          "m".getBytes(UTF_8))))
        assert(cli.fetch("logs", 0, 0L).records.size == 3)
      } finally cli.close()
    } finally broker.close()
  }

  test("produceRows: a DataFrame lands on the broker, keyed and valued") {
    val broker = new ScriptedBroker
    try {
      val df = Seq(("app.logs", "k1", """{"m":"1"}"""),
        ("app.logs", null, """{"m":"2"}"""))
        .toDF("topic", "key", "value")
      KafkaWire.produceRows(df.coalesce(1), "127.0.0.1", broker.port)
      val cli = new KafkaWire.Client("127.0.0.1", broker.port)
      try {
        val got = cli.fetch("app.logs", 0, 0L).records
        assert(got.size == 2)
        val byVal = got.map(r => new String(r.value, UTF_8)).sorted
        assert(byVal == Seq("""{"m":"1"}""", """{"m":"2"}"""))
        assert(got.exists(r => r.key != null &&
          new String(r.key, UTF_8) == "k1"))
        assert(got.exists(_.key == null))
      } finally cli.close()
    } finally broker.close()
  }

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
