package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sinks.KafkaSinkWriter
import graft.streaming.PublishItem

/** The SUBSCRIBER half over the wire: [[graft.sources
  * .KafkaEnvelopeSource]] consumes what [[KafkaSinkWriter]] produced —
  * through the same in-process wire-faithful broker, so every byte both
  * directions is real protocol (Fetch v4 responses are re-encoded v2
  * record batches the consumer CRC-verifies). The reference's consumers
  * apply changes from the BROKER, never the WAL
  * (cmd/consumer/main.go) — this is that deployment shape end to end.
  */
class KafkaConsumeSpec extends SparkSpec {
  import spark.implicits._

  test("consume: offsets resume across triggers; keys/values/offsets round-trip") {
    val broker = new InProcessKafkaBroker(nPartitions = 1)
    val w = new KafkaSinkWriter(s"127.0.0.1:${broker.port}")
    val out = Files.createTempDirectory("kconsume_out").toString
    val ck = Files.createTempDirectory("kconsume_ck").toString
    try {
      (1 to 3).foreach(i =>
        w.publish(PublishItem("t.env", s"e$i", s"payload-$i", i.toLong)))
      def runOnce(): Unit = {
        val q = spark.readStream
          .format("graft.sources.KafkaEnvelopeSource")
          .option("bootstrap", s"127.0.0.1:${broker.port}")
          .option("topic", "t.env")
          .load()
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ck)
          .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
        try q.processAllAvailable() finally q.stop()
      }
      runOnce()
      val first = spark.read.parquet(out)
        .select($"offset", $"key", $"value").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
      assert(first.toSeq == (1 to 3).map(i =>
        ((i - 1).toLong, "t.env", s"payload-$i")),
        s"all three records consumed with their log offsets: ${first.toSeq}")
      // new records after a restart: the checkpointed offsets resume —
      // nothing re-consumed, nothing skipped
      (4 to 5).foreach(i =>
        w.publish(PublishItem("t.env", s"e$i", s"payload-$i", i.toLong)))
      runOnce()
      val all = spark.read.parquet(out).select($"offset", $"value").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(all.toSeq == (1 to 5).map(i => ((i - 1).toLong, s"payload-$i")),
        s"resume consumed exactly the new tail: ${all.toSeq}")
    } finally { w.close(); broker.close() }
  }

  test("maxOffsetsPerTrigger bounds each micro-batch; the stream still drains completely") {
    val broker = new InProcessKafkaBroker(nPartitions = 1)
    val w = new KafkaSinkWriter(s"127.0.0.1:${broker.port}")
    val out = Files.createTempDirectory("kcap_out").toString
    val ck = Files.createTempDirectory("kcap_ck").toString
    try {
      (1 to 7).foreach(i =>
        w.publish(PublishItem("t.cap", s"e$i", s"v$i", i.toLong)))
      val q = spark.readStream
        .format("graft.sources.KafkaEnvelopeSource")
        .option("bootstrap", s"127.0.0.1:${broker.port}")
        .option("topic", "t.cap")
        .option("maxOffsetsPerTrigger", "2")
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.read.parquet(out).selectExpr("offset", "value")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(got.toSeq == (1 to 7).map(i => ((i - 1).toLong, s"v$i")),
        s"the capped stream still drains everything exactly once: ${got.toSeq}")
      // 7 records at <=2 per trigger: at least 4 committed micro-batches
      val batches = Option(new java.io.File(s"$ck/offsets").listFiles())
        .toSeq.flatten.count(f => f.getName.matches("\\d+"))
      assert(batches >= 4,
        s"admission cap must split the backlog across triggers: $batches")
    } finally { w.close(); broker.close() }
  }

  test("topicPattern subscribes like a wildcard subject: multiple topics, mid-stream births join") {
    val broker = new InProcessKafkaBroker(nPartitions = 1)
    val w = new KafkaSinkWriter(s"127.0.0.1:${broker.port}")
    val out = Files.createTempDirectory("kpattern_out").toString
    val ck = Files.createTempDirectory("kpattern_ck").toString
    try {
      w.publish(PublishItem("cdc.db.public.users", "e1", "u1", 1L))
      w.publish(PublishItem("cdc.db.public.orders", "e2", "o1", 2L))
      w.publish(PublishItem("other.stream", "e3", "x1", 3L)) // not ours
      def runOnce(): Unit = {
        val q = spark.readStream
          .format("graft.sources.KafkaEnvelopeSource")
          .option("bootstrap", s"127.0.0.1:${broker.port}")
          .option("topicPattern", "cdc\\.db\\..*")
          .load()
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ck)
          .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
        try q.processAllAvailable() finally q.stop()
      }
      runOnce()
      val first = spark.read.parquet(out)
        .select($"topic", $"value").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(first == Set(("cdc.db.public.users", "u1"),
        ("cdc.db.public.orders", "o1")),
        s"the pattern matches both cdc topics and excludes others: $first")
      // a topic born AFTER the subscription started (a newly replicated
      // table) joins on the next trigger, consumed from its log start
      w.publish(PublishItem("cdc.db.public.parts", "e4", "p1", 4L))
      runOnce()
      val all = spark.read.parquet(out)
        .select($"topic", $"value").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(all == first + (("cdc.db.public.parts", "p1")),
        s"mid-stream topic birth joins the wildcard subscription: $all")
    } finally { w.close(); broker.close() }
  }

  test("driver offset resolution is O(brokers), not O(partitions): <= brokers+1 " +
      "metadata/list round trips per trigger") {
    val broker = new InProcessKafkaBroker(nPartitions = 4)
    val w = new KafkaSinkWriter(s"127.0.0.1:${broker.port}")
    val topics = Seq("t.rpc.a", "t.rpc.b", "t.rpc.c")
    try {
      topics.foreach(t => w.publish(PublishItem(t, s"$t-e1", "v1", 1L)))
      // drive the MicroBatchStream directly so one trigger is isolable
      val stream = new graft.sources.KafkaEnvelopeStream(
        s"127.0.0.1:${broker.port}", topics, None, startLatest = false)
      try {
        val start = stream.initialOffset()
        // 3 topics x 4 partitions = 12 (topic, partition)s subscribed;
        // one trigger = latestOffset + planInputPartitions. Budget: ONE
        // batched ListOffsets per broker + at most one batched Metadata
        // (brokers + 1 with one broker = 2) — never one RPC per partition.
        broker.resetApiCounts()
        topics.foreach(t => w.publish(PublishItem(t, s"$t-e2", "v2", 2L)))
        val end = stream.latestOffset(start,
          org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
        val parts = stream.planInputPartitions(start, end)
        assert(parts.length == 3, s"one range per partition with new data: ${parts.length}")
        val trips = broker.apiCount(graft.sinks.KafkaWire.ApiListOffsets) +
          broker.apiCount(graft.sinks.KafkaWire.ApiMetadata)
        assert(trips <= 2,
          s"12 subscribed partitions must cost <= brokers+1 driver RPCs per trigger, got $trips " +
            s"(list=${broker.apiCount(graft.sinks.KafkaWire.ApiListOffsets)}, " +
            s"meta=${broker.apiCount(graft.sinks.KafkaWire.ApiMetadata)})")
        // and the SECOND trigger (caches warm) costs exactly one ListOffsets
        broker.resetApiCounts()
        val end2 = stream.latestOffset(end,
          org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
        stream.planInputPartitions(end, end2)
        assert(broker.apiCount(graft.sinks.KafkaWire.ApiListOffsets) == 1 &&
          broker.apiCount(graft.sinks.KafkaWire.ApiMetadata) == 0,
          "steady-state trigger = one batched ListOffsets, zero Metadata")
      } finally stream.stop()
    } finally { w.close(); broker.close() }
  }

  test("a topic born truncated consumes from its LOG START, not offset 0 " +
      "(capped end offsets can never land below the log start)") {
    val broker = new InProcessKafkaBroker(nPartitions = 1)
    val w = new KafkaSinkWriter(s"127.0.0.1:${broker.port}")
    try {
      w.publish(PublishItem("cdc.t.old", "e1", "old1", 1L))
      val stream = new graft.sources.KafkaEnvelopeStream(
        s"127.0.0.1:${broker.port}", Nil, Some("cdc\\.t\\..*"),
        startLatest = false, maxOffsetsPerTrigger = Some(4L))
      try {
        val start = stream.initialOffset()
        // a pattern-matched topic joins mid-stream with retention-truncated
        // history: log start 5, live records at offsets 5 and 6
        broker.compactBefore("cdc.t.born", 0, 5L)
        (1 to 2).foreach(i =>
          w.publish(PublishItem("cdc.t.born", s"b$i", s"v$i", i.toLong)))
        val end = stream.latestOffset(start,
          org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(8))
          .asInstanceOf[graft.sources.KafkaPartitionOffsets]
        val endBorn = end.positions(("cdc.t.born", 0))
        assert(endBorn == 7L,
          s"cap must floor at the LOG START (5), not 0 — a 0 floor caps the end at " +
            s"min(7, 0+4)=4 < log start and wedges the stream: got $endBorn")
        val parts = stream.planInputPartitions(start, end)
        val born = parts.map(_.asInstanceOf[graft.sources.KafkaRangePartition])
          .find(_.topic == "cdc.t.born").get
        assert(born.startOffset == 5L, s"consume floor is the log start: $born")
        val reader = new graft.sources.KafkaRangeReader(born)
        try {
          val got = Iterator.continually(reader)
            .takeWhile(_.next()).map(_.get().getUTF8String(4).toString).toList
          assert(got == List("v1", "v2"), s"truncated topic's live tail consumed: $got")
        } finally reader.close()
      } finally stream.stop()
    } finally { w.close(); broker.close() }
  }

  test("a fully-compacted planned range completes with zero rows instead of " +
      "spinning to the fetch deadline") {
    val broker = new InProcessKafkaBroker(nPartitions = 1)
    val w = new KafkaSinkWriter(s"127.0.0.1:${broker.port}")
    try {
      (1 to 3).foreach(i =>
        w.publish(PublishItem("t.gone", s"e$i", s"v$i", i.toLong)))
      // the checkpointed range [0, 3) was planned, then compaction removed
      // every offset in it; the log now starts at 3 with live records 3, 4
      broker.compactBefore("t.gone", 0, 3L)
      (4 to 5).foreach(i =>
        w.publish(PublishItem("t.gone", s"e$i", s"v$i", i.toLong)))
      val reader = new graft.sources.KafkaRangeReader(
        graft.sources.KafkaRangePartition(s"127.0.0.1:${broker.port}",
          "t.gone", 0, 0L, 3L))
      try {
        val t0 = System.nanoTime()
        assert(!reader.next(),
          "a range whose offsets no longer exist must complete empty (replaying it forever would fail the stream)")
        assert(System.nanoTime() - t0 < 30L * 1000 * 1000 * 1000,
          "completion must come from offset advance, not the 60 s deadline")
      } finally reader.close()
    } finally { w.close(); broker.close() }
  }

  test("pub/sub round trip: WAL -> pipeline -> broker -> envelope parse -> materialized view") {
    val broker = new InProcessKafkaBroker(nPartitions = 1)
    val tmp = Files.createTempDirectory("kroundtrip").toString
    val walDir = s"$tmp/wal"; Files.createDirectories(Paths.get(walDir))
    val ts = "2024-01-15 10:30:00.123456+00"
    def line(a: String, xid: Long, id: Long, v: String) = a match {
      case "B" | "C" => s"""{"action":"$a","xid":$xid,"timestamp":"$ts"}"""
      case _ =>
        s"""{"action":"$a","xid":$xid,"timestamp":"$ts","schema":"public","table":"kv","columns":[{"name":"id","type":"bigint","value":$id},{"name":"v","type":"text","value":"$v"}]}"""
    }
    Files.write(Paths.get(walDir, "wal-01.log"), Seq(
      line("B", 1, 0, ""), line("I", 1, 1, "a"), line("I", 1, 2, "b"),
      line("C", 1, 0, ""),
      line("B", 2, 0, ""), line("U", 2, 2, "b2"), line("C", 2, 0, ""))
      .mkString("\n").getBytes(UTF_8))
    val bs = s"127.0.0.1:${broker.port}"
    // producer half: decode -> assemble -> normalize -> publish to the broker
    val raw = spark.readStream.format("graft.sources.WalDirectorySource")
      .option("path", walDir).load()
    val pub = graft.streaming.CdcStream.start(spark, raw, "rtdb",
      s"$tmp/out", s"$tmp/pub_ck",
      sinkWriter = Some(() => new KafkaSinkWriter(bs)))
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (broker.received.size() < 3 &&
        pub.exception.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      pub.exception.foreach(e => throw e)
      assert(broker.received.size() == 3, "three events on the broker")
    } finally pub.stop()
    // consumer half: envelopes off the broker -> typed columns -> MV fold
    val envs = graft.cdc.Transform.parseEnvelope(
      spark.readStream.format("graft.sources.KafkaEnvelopeSource")
        .option("bootstrap", bs).option("topic", "cdc.rtdb.public.kv").load(),
      col("value"))
    val state = s"$tmp/state"
    val mv = graft.streaming.MaterializedView.start(spark, envs, state,
      s"$tmp/mv_ck", keyCols = Seq("id"),
      seq = graft.streaming.OrderedSink.lsnNumeric(col("lsn")),
      trigger = Trigger.ProcessingTime("50 milliseconds"))
    try mv.processAllAvailable() finally mv.stop()
    val got = graft.streaming.MaterializedView
      .currentState(spark, state, Seq("id"))
      .select($"id", element_at($"image", "v")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("1" -> "a", "2" -> "b2"),
      s"broker-fed view converges to the WAL's final state: $got")
  }

  test("groupId mirrors each batch's end offsets to the broker: ecosystem " +
      "lag tooling sees the checkpoint's progress") {
    val broker = new InProcessKafkaBroker(nPartitions = 2)
    val w = new KafkaSinkWriter(s"127.0.0.1:${broker.port}")
    val out = Files.createTempDirectory("kgroup_out").toString
    val ck = Files.createTempDirectory("kgroup_ck").toString
    try {
      (1 to 6).foreach(i =>
        w.publish(PublishItem(s"t.grp.${i % 2}", s"e$i", s"v$i", i.toLong)))
      val q = spark.readStream
        .format("graft.sources.KafkaEnvelopeSource")
        .option("bootstrap", s"127.0.0.1:${broker.port}")
        .option("topic", "t.grp.0,t.grp.1")
        .option("groupId", "graft-mirror")
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      try q.processAllAvailable() finally q.stop()
      assert(spark.read.parquet(out).count() == 6, "all six records consumed")
      // the mirrored commits must equal the high watermark per consumed
      // partition — what `kafka-consumer-groups --describe` reports as
      // lag 0 for the group
      val subjects = Seq("t.grp.0", "t.grp.1")
      val mirrored = (for (t <- subjects; p <- 0 to 1)
        yield (t, p) -> broker.committedOffset("graft-mirror", t, p)).toMap
      // the producer keys by subject, so each topic's records land on one
      // partition; every partition that RECEIVED data must be mirrored at
      // its end offset (3 records per topic)
      import scala.jdk.CollectionConverters._
      val hw = broker.received.asScala.groupBy(r => (r.topic, r.partition))
        .map { case (tp, rs) => tp -> (rs.map(_.baseOffset).max + 1) }
      assert(hw.nonEmpty && hw.forall { case (tp, end) =>
        mirrored.get(tp).flatten.contains(end) },
        s"mirror must match the consumed high watermarks: hw=$hw mirrored=$mirrored")
      // coordinator resolution is cached: ONE FindCoordinator for the run
      assert(broker.apiCount(graft.sinks.KafkaWire.ApiFindCoordinator) == 1,
        "coordinator resolved once and cached")
      assert(broker.apiCount(graft.sinks.KafkaWire.ApiOffsetCommit) >= 1,
        "at least one batched commit")
    } finally { w.close(); broker.close() }
  }

  test("startingOffsets=group takes over from an ecosystem consumer's " +
      "committed position; uncommitted partitions fall back to the log start") {
    val broker = new InProcessKafkaBroker(nPartitions = 1)
    val w = new KafkaSinkWriter(s"127.0.0.1:${broker.port}")
    val out = Files.createTempDirectory("khandover_out").toString
    val ck = Files.createTempDirectory("khandover_ck").toString
    try {
      (1 to 5).foreach(i =>
        w.publish(PublishItem("t.hand.a", s"a$i", s"a$i", i.toLong)))
      (1 to 2).foreach(i =>
        w.publish(PublishItem("t.hand.b", s"b$i", s"b$i", i.toLong)))
      // the previous (ecosystem) consumer of t.hand.a stopped at offset 3;
      // t.hand.b has no commit under the group
      broker.seedCommit("legacy-app", "t.hand.a", 0, 3L)
      val q = spark.readStream
        .format("graft.sources.KafkaEnvelopeSource")
        .option("bootstrap", s"127.0.0.1:${broker.port}")
        .option("topic", "t.hand.a,t.hand.b")
        .option("groupId", "legacy-app")
        .option("startingOffsets", "group")
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.read.parquet(out).selectExpr("topic", "value")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == Set(("t.hand.a", "a4"), ("t.hand.a", "a5"),
        ("t.hand.b", "b1"), ("t.hand.b", "b2")),
        s"resume from the committed position on a, the log start on b: $got")
      // and the takeover keeps mirroring: both partitions now committed
      // at their ends under the same group
      assert(broker.committedOffset("legacy-app", "t.hand.a", 0).contains(5L) &&
        broker.committedOffset("legacy-app", "t.hand.b", 0).contains(2L),
        "handover continues the group's lag view")
    } finally { w.close(); broker.close() }
  }

  test("trigger cadence cost: 256 subscribed partitions, steady-state " +
      "driver overhead measured per trigger (the O(1)-RPC evidence)") {
    // the scale shape the batched ListOffsets exists for: many
    // partitions, ONE broker round trip per trigger regardless. 4
    // topics x 64 partitions = 256 subscribed (topic, partition)s;
    // measure the driver's whole per-trigger offset-resolution wall
    // (latestOffset + planInputPartitions) over 50 steady-state
    // triggers. The figure is cited in SCALE.md — the pre-batching
    // code paid 256 serial RTTs here, ~256x this number at any real
    // network latency.
    val broker = new InProcessKafkaBroker(nPartitions = 64)
    val w = new KafkaSinkWriter(s"127.0.0.1:${broker.port}")
    val topics = (1 to 4).map(i => s"t.cad.$i")
    try {
      topics.foreach(t => w.publish(PublishItem(t, s"$t-e1", "v1", 1L)))
      val stream = new graft.sources.KafkaEnvelopeStream(
        s"127.0.0.1:${broker.port}", topics, None, startLatest = false)
      try {
        var off = stream.initialOffset()
        val lim = org.apache.spark.sql.connector.read.streaming
          .ReadLimit.allAvailable()
        // warm: first trigger pays the one-off Metadata + earliest floors
        stream.planInputPartitions(off, stream.latestOffset(off, lim))
        broker.resetApiCounts()
        val walls = (1 to 50).map { _ =>
          val t0 = System.nanoTime()
          val end = stream.latestOffset(off, lim)
          stream.planInputPartitions(off, end)
          off = end
          (System.nanoTime() - t0) / 1e6
        }.sorted
        val list = broker.apiCount(graft.sinks.KafkaWire.ApiListOffsets)
        val meta = broker.apiCount(graft.sinks.KafkaWire.ApiMetadata)
        assert(list == 50 && meta == 0,
          s"steady state: exactly one batched ListOffsets per trigger " +
            s"for 256 partitions (list=$list, meta=$meta)")
        val median = walls(walls.length / 2)
        info(f"per-trigger driver offset resolution, 256 partitions: " +
          f"median ${median}%.2f ms, p90 ${walls((walls.length * 9) / 10)}%.2f ms")
        // loopback budget: generous enough for CI noise, tight enough
        // that a regression to per-partition RPCs (256 RTTs + 256x the
        // encode work) trips it
        assert(median < 50.0,
          f"median per-trigger resolution ${median}%.2f ms exceeds 50 ms")
      } finally stream.stop()
    } finally { w.close(); broker.close() }
  }

  test("isolation=read_committed: aborted transactions never surface; " +
      "read_uncommitted sees them; LSO halts planning before an open txn") {
    val broker = new InProcessKafkaBroker(nPartitions = 1)
    try {
      // a transactional producer's log: committed txn, aborted txn,
      // committed txn from another pid, one plain record
      broker.appendTransactional("t.txn", 0, 100L,
        Seq(("k1", "committed-1"), ("k2", "committed-2")))
      broker.endTxn("t.txn", 0, 100L, commit = true)
      broker.appendTransactional("t.txn", 0, 100L,
        Seq(("k3", "aborted-1"), ("k4", "aborted-2")))
      broker.endTxn("t.txn", 0, 100L, commit = false)
      broker.appendTransactional("t.txn", 0, 200L, Seq(("k5", "committed-3")))
      broker.endTxn("t.txn", 0, 200L, commit = true)
      val w = new KafkaSinkWriter(s"127.0.0.1:${broker.port}")
      try w.publish(PublishItem("t.txn", "k6", "plain", 1L)) finally w.close()

      def consume(isolation: String): Seq[String] = {
        val out = Files.createTempDirectory(s"ktxn_out_$isolation").toString
        val ck = Files.createTempDirectory(s"ktxn_ck_$isolation").toString
        val q = spark.readStream
          .format("graft.sources.KafkaEnvelopeSource")
          .option("bootstrap", s"127.0.0.1:${broker.port}")
          .option("topic", "t.txn")
          .option("isolation", isolation)
          .load()
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ck)
          .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
        try q.processAllAvailable() finally q.stop()
        spark.read.parquet(out).select($"offset", $"value").collect()
          .sortBy(_.getLong(0)).map(_.getString(1)).toSeq
      }
      assert(consume("read_committed") ==
        Seq("committed-1", "committed-2", "committed-3", "plain"),
        "aborted records and markers are invisible; offsets still advance " +
          "through the aborted span")
      assert(consume("read_uncommitted") ==
        Seq("committed-1", "committed-2", "aborted-1", "aborted-2",
          "committed-3", "plain"),
        "the default view surfaces aborted data (markers still skipped)")

      // an OPEN transaction caps the committed view at the LSO: nothing
      // past the open txn's first offset is planned, so the trigger
      // completes instead of blocking on withheld records
      broker.appendTransactional("t.txn", 0, 300L, Seq(("k7", "open-1")))
      assert(consume("read_committed") ==
        Seq("committed-1", "committed-2", "committed-3", "plain"),
        "open-txn records stay invisible and the stream still drains")
      broker.endTxn("t.txn", 0, 300L, commit = true)
      assert(consume("read_committed") ==
        Seq("committed-1", "committed-2", "committed-3", "plain", "open-1"),
        "once committed, the LSO advances and the records surface")
    } finally broker.close()
  }

  test("exactly-once publish: a zombie's uncommitted batch aborts; the " +
      "successor's identical batch lands ONCE under read_committed") {
    val broker = new InProcessKafkaBroker(nPartitions = 1)
    try {
      def writer(tag: String) = new KafkaSinkWriter(
        s"127.0.0.1:${broker.port}", clientId = tag,
        transactionalId = Some("graft-eos-p0"))
      val batch = (1 to 3).map(i =>
        PublishItem("t.eos", s"e$i", s"v$i", i.toLong))
      // incarnation 1 (the task attempt that will fail) publishes the
      // whole batch but dies before commit
      val w1 = writer("w1")
      batch.foreach(w1.publish)
      // incarnation 2 (the task retry) registers the same transactional
      // id — the coordinator aborts w1's dangling txn and fences it —
      // then re-publishes the identical batch and commits
      val w2 = writer("w2")
      batch.foreach(w2.publish)
      w2.commit(); w2.close()
      // the zombie's late commit is rejected, not applied
      intercept[graft.streaming.PermanentPublishException] { w1.commit() }
      w1.close()

      def consume(isolation: String): Seq[String] = {
        val out = Files.createTempDirectory(s"keos_out_$isolation").toString
        val ck = Files.createTempDirectory(s"keos_ck_$isolation").toString
        val q = spark.readStream
          .format("graft.sources.KafkaEnvelopeSource")
          .option("bootstrap", s"127.0.0.1:${broker.port}")
          .option("topic", "t.eos")
          .option("isolation", isolation)
          .load()
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ck)
          .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
        try q.processAllAvailable() finally q.stop()
        spark.read.parquet(out).select($"offset", $"value").collect()
          .sortBy(_.getLong(0)).map(_.getString(1)).toSeq
      }
      assert(consume("read_committed") == Seq("v1", "v2", "v3"),
        "exactly one copy of the batch is visible — the zombie attempt's " +
          "copy sits inside an aborted span")
      assert(consume("read_uncommitted") ==
        Seq("v1", "v2", "v3", "v1", "v2", "v3"),
        "the default view shows both attempts (markers still skipped)")
    } finally broker.close()
  }

  test("admission prorates by lag: a hot partition drains in fewer " +
      "triggers than an even split would allow") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val broker = new InProcessKafkaBroker(nPartitions = 2)
    val w = new KafkaSinkWriter(s"127.0.0.1:${broker.port}")
    try {
      // one subject = one partition (murmur2 keying): 12 records pile on
      // a single HOT partition, the other stays caught up at lag 0
      (1 to 12).foreach(i =>
        w.publish(PublishItem("t.skew", s"e$i", s"v$i", i.toLong)))
      val stream = new graft.sources.KafkaEnvelopeStream(
        s"127.0.0.1:${broker.port}", Seq("t.skew"), None,
        startLatest = false, maxOffsetsPerTrigger = Some(6L))
      try {
        val start = stream.initialOffset()
          .asInstanceOf[graft.sources.KafkaPartitionOffsets]
        val full = stream.latestOffset(start, ReadLimit.allAvailable())
          .asInstanceOf[graft.sources.KafkaPartitionOffsets]
        val hot = full.positions.maxBy(_._2)._1
        assert(full.positions(hot) == 12L && full.positions.size == 2,
          s"all 12 records on one partition: ${full.positions}")
        // trigger 1: the whole 6-offset budget goes to the hot partition
        // (even split would hand 3 to each and waste the cold one's half)
        val end1 = stream.latestOffset(start, ReadLimit.maxRows(6L))
          .asInstanceOf[graft.sources.KafkaPartitionOffsets]
        assert(end1.positions(hot) == 6L,
          s"lag-prorated budget must all land on the hot partition: " +
            s"${end1.positions}")
        // trigger 2 finishes the backlog: 2 triggers total where the
        // even split needed 4 (12 records at 3 per trigger)
        val end2 = stream.latestOffset(end1, ReadLimit.maxRows(6L))
          .asInstanceOf[graft.sources.KafkaPartitionOffsets]
        assert(end2.positions(hot) == 12L,
          s"hot partition drained by trigger 2: ${end2.positions}")
      } finally stream.stop()
    } finally { w.close(); broker.close() }
  }
}
