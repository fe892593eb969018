package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** MQTT broker-side source e2e against a raw-socket client: the wire
  * behaviors of mqtt_prot.c — CONNACK handshake, QoS1 PUBACK echoing the
  * packet id, PINGREQ/PINGRESP, JSON-map payload gate, frames split
  * across TCP writes.
  */
class MqttSourceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import MqttServerSource._

  private def awaitRows(name: String, n: Long, timeoutMs: Long = 60000): Unit = {
    val deadline = System.currentTimeMillis + timeoutMs
    var count = spark.table(name).count()
    while (count < n && System.currentTimeMillis < deadline) {
      Thread.sleep(100); count = spark.table(name).count()
    }
    assert(count >= n, s"$name: $count rows after ${timeoutMs}ms, wanted $n")
  }

  private def varint(n: Int): Array[Byte] = {
    var len = n
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    do {
      var b = len % 128
      len /= 128
      if (len > 0) b |= 128
      out += b.toByte
    } while (len > 0)
    out.toArray
  }

  private def packet(ptype: Int, flags: Int, body: Array[Byte]): Array[Byte] =
    Array(((ptype << 4) | flags).toByte) ++ varint(body.length) ++ body

  private def publishBody(topic: String, packetId: Option[Int], payload: String): Array[Byte] = {
    val t = topic.getBytes("UTF-8")
    Array((t.length >> 8).toByte, (t.length & 0xff).toByte) ++ t ++
      packetId.map(id => Array((id >> 8).toByte, (id & 0xff).toByte))
        .getOrElse(Array.empty[Byte]) ++
      payload.getBytes("UTF-8")
  }

  test("isJsonObject accepts exactly one complete map, rejects the rest") {
    assert(isJsonObject("""{"a":1}"""))
    assert(isJsonObject("""  {"a":{"b":[1,2]},"s":"x\"}{"} """))
    assert(!isJsonObject("""[1,2]"""))      // array top-level: rejected
    assert(!isJsonObject(""""str""""))
    assert(!isJsonObject("""{"a":1}{"b":2}""")) // trailing garbage
    assert(!isJsonObject("""{"a":1"""))     // unterminated
    assert(!isJsonObject("hello"))
  }

  test("mqtt e2e: connect/publish/ping against a raw socket client") {
    val probe = new java.net.ServerSocket(0)
    val port = probe.getLocalPort
    probe.close()

    val src = spark.readStream.format("graft.sources.MqttServerSource")
      .option("port", port).load()
      .select(col("topic"), col("qos"),
        from_json(col("value"),
          org.apache.spark.sql.types.StructType.fromDDL("temp double, unit string")).as("r"))
      .select(col("topic"), col("qos"), col("r.temp"), col("r.unit"))
    val q = src.writeStream.format("memory").queryName("mqtt_in")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      var sock: java.net.Socket = null
      val deadline = System.currentTimeMillis + 30000
      while (sock == null && System.currentTimeMillis < deadline) {
        try sock = new java.net.Socket("127.0.0.1", port)
        catch { case _: java.net.ConnectException => Thread.sleep(100) }
      }
      assert(sock != null, s"could not connect to mqtt source on $port")
      val out = sock.getOutputStream
      val in = sock.getInputStream

      // CONNECT (v3.1.1 variable header + client id), expect CONNACK
      // session-present=1 accepted (mqtt_handle_connect)
      val connBody = Array[Byte](0, 4, 'M', 'Q', 'T', 'T', 4, 2, 0, 60, 0, 3,
        'a', 'b', 'c')
      out.write(packet(CONNECT, 0, connBody)); out.flush()
      val connack = in.readNBytes(4)
      assert(connack.toSeq == Seq(0x20.toByte, 2.toByte, 1.toByte, 0.toByte))

      // QoS0 publish, frame split across two writes (reassembly)
      val p0 = packet(PUBLISH, 0,
        publishBody("sensors/t1", None, """{"temp":21.5,"unit":"C"}"""))
      out.write(p0.take(7)); out.flush()
      Thread.sleep(200)
      out.write(p0.drop(7)); out.flush()

      // QoS1 publish: PUBACK must echo packet id 0x002A
      out.write(packet(PUBLISH, 2,
        publishBody("sensors/t2", Some(42), """{"temp":-3.25,"unit":"F"}""")))
      out.flush()
      val puback = in.readNBytes(4)
      assert(puback.toSeq == Seq(0x40.toByte, 2.toByte, 0.toByte, 42.toByte))

      // non-JSON payload: dropped, connection stays healthy
      out.write(packet(PUBLISH, 0, publishBody("sensors/bad", None, "hello")))
      out.flush()

      // PINGREQ → PINGRESP
      out.write(packet(PINGREQ, 0, Array.empty)); out.flush()
      val pong = in.readNBytes(2)
      assert(pong.toSeq == Seq(0xd0.toByte, 0.toByte))

      awaitRows("mqtt_in", 2)
      out.write(packet(DISCONNECT, 0, Array.empty)); out.flush()
      sock.close()
    } finally q.stop()
    val got = spark.table("mqtt_in")
      .as[(String, Int, Double, String)].collect().toSet
    assert(got == Set(
      ("sensors/t1", 0, 21.5, "C"),
      ("sensors/t2", 1, -3.25, "F")))
  }

  test("first packet not CONNECT: connection dropped, no rows") {
    val probe = new java.net.ServerSocket(0)
    val port = probe.getLocalPort
    probe.close()

    val src = spark.readStream.format("graft.sources.MqttServerSource")
      .option("port", port).load().select("topic")
    val q = src.writeStream.format("memory").queryName("mqtt_reject")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      var sock: java.net.Socket = null
      val deadline = System.currentTimeMillis + 30000
      while (sock == null && System.currentTimeMillis < deadline) {
        try sock = new java.net.Socket("127.0.0.1", port)
        catch { case _: java.net.ConnectException => Thread.sleep(100) }
      }
      assert(sock != null)
      val out = sock.getOutputStream
      out.write(packet(PUBLISH, 0,
        publishBody("sneak", None, """{"a":1}"""))) // no CONNECT first
      out.flush()
      // server hangs up: next read hits EOF
      val eof = sock.getInputStream.read()
      assert(eof == -1, "expected hangup on missing CONNECT")
      sock.close()
      Thread.sleep(500)
      assert(spark.table("mqtt_reject").count() == 0)
    } finally q.stop()
  }
}
