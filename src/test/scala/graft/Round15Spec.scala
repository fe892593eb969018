package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Registry, StreamQueries}

/** Round-15: checkpoint-resume evidence for the stateful streaming
  * surface (VERDICT r14 #1) — a streaming query killed mid-feed and
  * restarted from its checkpoint must deliver the batch relation
  * exactly once, on both state-store providers. The gates
  * (`x_dedup_resume_stream` / `x_dedup_resume_rocksdb`) hash-match the
  * DuckDB oracle; this spec additionally asserts the restart REALLY
  * resumed (first post-restart batch id past 0, committed rows before
  * the kill) rather than silently re-running from scratch.
  */
class Round15Spec extends AnyFunSuite {
  import TestSpark._

  private def batchExpect: Map[String, Long] =
    spark.read.parquet(sf + "/documents.parquet")
      .groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def runResume(gate: String): Unit = {
    StreamQueries.lastResumeStats = null
    val got = Registry.queries(gate)(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == batchExpect, s"$gate result != batch dedup relation")
    val st = StreamQueries.lastResumeStats
    assert(st != null, "resume stats not recorded")
    assert(st.rowsBeforeKill > 0,
      s"nothing committed before the kill (${st.rowsBeforeKill})")
    assert(st.killedAtBatch >= 1,
      s"killed run committed fewer than 2 batches (${st.killedAtBatch})")
    assert(st.resumedFromBatch > 0,
      s"restart did not resume: first post-restart batch " +
        s"${st.resumedFromBatch} (a from-scratch run re-runs batch 0)")
  }

  test("checkpoint-resume: mid-feed kill + restart delivers the batch " +
       "relation exactly once (default provider)") {
    runResume("x_dedup_resume_stream")
  }

  test("checkpoint-resume: RocksDB provider recovers keeper state from " +
       "the checkpointed snapshot across a restart") {
    runResume("x_dedup_resume_rocksdb")
  }

  test("checkpoint-resume: RocksDB CHANGELOG checkpointing (the modern " +
       "low-latency recovery path) also restores keeper state exactly") {
    val PROV = "spark.sql.streaming.stateStore.providerClass"
    val CLOG = "spark.sql.streaming.stateStore.rocksdb." +
      "changelogCheckpointing.enabled"
    val savedProv = spark.conf.getOption(PROV)
    val savedClog = spark.conf.getOption(CLOG)
    spark.conf.set(PROV, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    spark.conf.set(CLOG, "true")
    try {
      StreamQueries.lastResumeStats = null
      val got = StreamQueries.resumeDedup(spark, sf, Some("rocksclog"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == batchExpect,
        "changelog-checkpointed resume != batch dedup relation")
      val st = StreamQueries.lastResumeStats
      assert(st != null && st.resumedFromBatch > 0 && st.rowsBeforeKill > 0,
        s"restart did not resume under changelog checkpointing: $st")
    } finally {
      savedProv.fold(spark.conf.unset(PROV))(spark.conf.set(PROV, _))
      savedClog.fold(spark.conf.unset(CLOG))(spark.conf.set(CLOG, _))
    }
  }

  // ------------------------------------------- upstream_servers failover

  private def awaitRows(table: String, expected: Long): Unit = {
    val deadline = System.currentTimeMillis + 30000
    while (spark.table(table).count() < expected &&
           System.currentTimeMillis < deadline) Thread.sleep(100)
  }

  test("out_forward upstream_servers: YAML node list drives HA failover " +
       "around a dead node (flb_upstream_ha round-robin + retry)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    // live node = our own in_forward source; dead node = a never-bound
    // port (connection refused, the reference's FLB_RETRY path)
    val p1 = new java.net.ServerSocket(0); val livePort = p1.getLocalPort
    p1.close()
    val p2 = new java.net.ServerSocket(0); val deadPort = p2.getLocalPort
    p2.close()

    // the section arrives as CONFIG, not code: parsed by the YAML
    // frontend, typed by YamlConfig.upstreams, fed to writeHa
    val doc = graft.config.YamlConfig.load(
      s"""env:
         |  live_port: "$livePort"
         |upstream_servers:
         |  - name: forward-balancing
         |    nodes:
         |      - name: node-1
         |        host: 127.0.0.1
         |        port: $deadPort
         |      - name: node-2
         |        host: 127.0.0.1
         |        port: $${live_port}
         |""".stripMargin)
    val ups = graft.config.YamlConfig.upstreams(doc)("forward-balancing")
    assert(ups.map(_.name) == Seq("node-1", "node-2"))
    assert(ups(1).port == livePort, "env interpolation inside the section")
    val nodes = ups.map(u =>
      graft.sinks.ForwardSink.Node(u.host, u.port,
        sharedKey = u.props.get("shared_key")))

    val received = spark.readStream
      .format("graft.sources.ForwardServerSource")
      .option("port", livePort).load()
      .select(col("tag"), element_at(col("record"), "msg").as("msg"))
    val q = received.writeStream.format("memory").queryName("ha_relay")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    try {
      val deadline = System.currentTimeMillis + 30000
      var up = false
      while (!up && System.currentTimeMillis < deadline) {
        try { new java.net.Socket("127.0.0.1", livePort).close(); up = true }
        catch { case _: java.net.ConnectException => Thread.sleep(100) }
      }
      assert(up)
      // two partitions: one starts on the dead node (fails over), one
      // on the live node — both delivery paths exercised in one write
      val outDf = Seq(
        ("app.ha", 1704067200L, Map("msg" -> "one")),
        ("app.ha", 1704067201L, Map("msg" -> "two")),
        ("app.hb", 1704067202L, Map("msg" -> "three")))
        .toDF("tag", "ts_sec", "record").repartition(2)
      graft.sinks.ForwardSink.writeHa(outDf, nodes)
      awaitRows("ha_relay", 3)
    } finally q.stop()
    val got = spark.table("ha_relay").as[(String, String)].collect().toSet
    spark.catalog.dropTempView("ha_relay")
    assert(got == Set(("app.ha", "one"), ("app.ha", "two"),
      ("app.hb", "three")))
  }

  test("classic upstream file parses to the same typed nodes as the " +
       "YAML section (one definition, two syntaxes)") {
    val (name, nodes) = graft.config.ClassicConfig.upstreamFile(
      """[UPSTREAM]
        |    name forward-balancing
        |
        |[NODE]
        |    name node-1
        |    host 127.0.0.1
        |    port 43000
        |
        |[NODE]
        |    name node-2
        |    host 127.0.0.1
        |    port 44000
        |    shared_key secret
        |""".stripMargin)
    assert(name == "forward-balancing")
    assert(nodes.map(n => (n.name, n.host, n.port)) ==
      Seq(("node-1", "127.0.0.1", 43000), ("node-2", "127.0.0.1", 44000)))
    assert(nodes(1).props.get("shared_key").contains("secret"))
    // identical to the YAML frontend's typed view of the same definition
    val doc = graft.config.YamlConfig.load(
      """upstream_servers:
        |  - name: forward-balancing
        |    nodes:
        |      - name: node-1
        |        host: 127.0.0.1
        |        port: 43000
        |      - name: node-2
        |        host: 127.0.0.1
        |        port: 44000
        |        shared_key: secret
        |""".stripMargin)
    assert(graft.config.YamlConfig.upstreams(doc)("forward-balancing") ==
      nodes)
  }

  // ------------------------------------------------- engine self-telemetry

  test("self-telemetry: StreamingQueryProgress flows as cmetrics rows " +
       "through the gated metrics operators (in_fluentbit_metrics analog)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.streaming.Stateful
    implicit val sqlCtx = spark.sqlContext
    // a stateful query so stateOperators metrics appear too
    val in = MemoryStream[Stateful.HashedDoc]
    val q = Stateful.dedupStream(spark, in.toDS())
      .writeStream.format("memory").queryName("telemetry_probe")
      .outputMode("append").start()
    val batchSizes = Seq(40, 25, 35)
    try {
      var id = 0L
      batchSizes.foreach { n =>
        in.addData((0 until n).map { _ =>
          id += 1; Stateful.HashedDoc(s"h$id", id)
        })
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.catalog.dropTempView("telemetry_probe")
    val m = graft.obs.SelfTelemetry.progressRows(spark,
      q.recentProgress.toSeq.sortBy(_.batchId))
    // 1) the selector operator over OUR OWN signal: prefix include
    val counters = graft.ops.MetricsSelector(m, col("name"),
      "graft_input", graft.ops.MetricsSelector.Include, opType = "prefix")
      .filter(col("name") === "graft_input_records_total")
    // counters are CUMULATIVE (cmetrics contract): final total = the fed
    // row count
    val finals = counters.orderBy(col("batch_id").desc).limit(1)
      .select(col("value")).as[Double].collect()
    assert(finals.headOption.contains(batchSizes.sum.toDouble),
      s"cumulative input counter ${finals.toSeq} != ${batchSizes.sum}")
    // 2) cumulative_to_delta inverts the counter back to per-batch reads
    val deltas = graft.ops.CumulativeToDelta(
        counters, seriesCols = Seq(col("name")),
        orderCols = Seq(col("batch_id")), valueCol = col("value"),
        outName = "delta")
      .filter(col("delta").isNotNull).filter(col("delta") > 0)
      .orderBy(col("batch_id")).select(col("delta")).as[Double].collect()
    assert(deltas.toSeq.takeRight(2) == batchSizes.drop(1).map(_.toDouble),
      s"deltas ${deltas.toSeq} do not recover per-batch input sizes")
    // 3) the stateful footprint is visible: state rows grew to the
    // distinct-key count
    val stateRows = m.filter(col("name") === "graft_state_rows")
      .orderBy(col("batch_id").desc).limit(1)
      .select(col("value")).as[Double].collect()
    assert(stateRows.headOption.exists(_ == batchSizes.sum.toDouble),
      s"state rows ${stateRows.toSeq} != distinct keys ${batchSizes.sum}")
  }

  test("out_forward upstream_servers: round-robin SPREADS load across " +
       "live nodes (partition i starts at node i % n)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    def listener(port: Int, table: String) = {
      val df = spark.readStream.format("graft.sources.ForwardServerSource")
        .option("port", port).load()
        .select(col("tag"), element_at(col("record"), "msg").as("msg"))
      df.writeStream.format("memory").queryName(table)
        .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
    }
    val pa = new java.net.ServerSocket(0); val portA = pa.getLocalPort
    pa.close()
    val pb = new java.net.ServerSocket(0); val portB = pb.getLocalPort
    pb.close()
    val qa = listener(portA, "rr_a")
    val qb = listener(portB, "rr_b")
    try {
      Seq(portA, portB).foreach { port =>
        val deadline = System.currentTimeMillis + 30000
        var up = false
        while (!up && System.currentTimeMillis < deadline) {
          try { new java.net.Socket("127.0.0.1", port).close(); up = true }
          catch { case _: java.net.ConnectException => Thread.sleep(100) }
        }
        assert(up)
      }
      // repartition(4) with no columns = RoundRobinPartitioning: 40 rows
      // split 10/10/10/10, partitions {0,2} -> node A, {1,3} -> node B
      val outDf = (0 until 40)
        .map(i => ("app.rr", 1704067200L + i, Map("msg" -> s"m$i")))
        .toDF("tag", "ts_sec", "record").repartition(4)
      graft.sinks.ForwardSink.writeHa(outDf, Seq(
        graft.sinks.ForwardSink.Node("127.0.0.1", portA),
        graft.sinks.ForwardSink.Node("127.0.0.1", portB)))
      val deadline = System.currentTimeMillis + 30000
      while (spark.table("rr_a").count() + spark.table("rr_b").count() < 40 &&
             System.currentTimeMillis < deadline) Thread.sleep(100)
    } finally { qa.stop(); qb.stop() }
    val a = spark.table("rr_a").select("msg").as[String].collect().toSet
    val b = spark.table("rr_b").select("msg").as[String].collect().toSet
    spark.catalog.dropTempView("rr_a")
    spark.catalog.dropTempView("rr_b")
    assert(a.size == 20 && b.size == 20,
      s"round-robin spread broken: ${a.size}/${b.size}")
    assert((a ++ b) == (0 until 40).map(i => s"m$i").toSet, "rows lost")
  }

  test("out_forward upstream_servers: every node down raises after " +
       "trying the whole ring") {
    import spark.implicits._
    val p = new java.net.ServerSocket(0); val dead1 = p.getLocalPort
    p.close()
    val p2 = new java.net.ServerSocket(0); val dead2 = p2.getLocalPort
    p2.close()
    val outDf = Seq(("t", 1L, Map("m" -> "x")))
      .toDF("tag", "ts_sec", "record")
    val e = intercept[org.apache.spark.SparkException] {
      graft.sinks.ForwardSink.writeHa(outDf, Seq(
        graft.sinks.ForwardSink.Node("127.0.0.1", dead1),
        graft.sinks.ForwardSink.Node("127.0.0.1", dead2)))
    }
    assert(e.getMessage.contains("upstream nodes failed") ||
      Option(e.getCause).exists(_.getMessage.contains("upstream")))
  }
}
