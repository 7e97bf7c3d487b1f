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
}
