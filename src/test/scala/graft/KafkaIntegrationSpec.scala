package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8

import graft.sinks.KafkaSinkWriter
import graft.streaming.PublishItem

/** OPT-IN integration suite against a LIVE Kafka broker — the sink-side
  * twin of [[PostgresIntegrationSpec]] (reference: the JetStream
  * publisher is validated against a real broker in the tests/integration
  * pack). Cancels (not fails) unless `GRAFT_IT_KAFKA=1`.
  *
  * To run:
  *   docker compose up -d kafka     # single-node KRaft, PLAINTEXT :9092
  *   GRAFT_IT_KAFKA=1 sbt "testOnly graft.KafkaIntegrationSpec"
  *
  * Endpoint override: GRAFT_IT_KAFKA_BOOTSTRAP (default localhost:9092).
  *
  * What this proves beyond the wire-faithful in-process broker
  * (KafkaWireSpec): a real broker's Metadata answers resolve leaders, a
  * real log accepts and CRC-validates our v2 record batches (a framing
  * or CRC bug is a broker-side rejection here), and acked base offsets
  * advance monotonically — genuine appends, not echoes.
  */
class KafkaIntegrationSpec extends SparkSpec {

  private val enabled = sys.env.get("GRAFT_IT_KAFKA").contains("1")
  private def bootstrap =
    sys.env.getOrElse("GRAFT_IT_KAFKA_BOOTSTRAP", "localhost:9092")

  test("produce: real broker acks subject-keyed batches with advancing offsets") {
    assume(enabled, "set GRAFT_IT_KAFKA=1 (and docker compose up -d kafka) to run")
    val topicSuffix = System.nanoTime() // fresh topic per run (auto-created)
    val subject = s"graft.it.sink.$topicSuffix"
    val w = new KafkaSinkWriter(bootstrap)
    try {
      val offs = (1 to 3).map { i =>
        w.publish(PublishItem(subject, s"e$i", s"""{"n":$i}""", i.toLong))
        w.lastBaseOffset
      }
      assert(offs == Seq(0L, 1L, 2L),
        s"a real log appends at monotonically advancing offsets: $offs")
    } finally w.close()
  }

  test("produce then consume: values round-trip through the real log") {
    assume(enabled, "set GRAFT_IT_KAFKA=1 (and docker compose up -d kafka) to run")
    val subject = s"graft.it.roundtrip.${System.nanoTime()}"
    val w = new KafkaSinkWriter(bootstrap)
    try (1 to 3).foreach(i =>
      w.publish(PublishItem(subject, s"e$i", s"""{"n":$i}""", i.toLong)))
    finally w.close()
    val out = Files.createTempDirectory("it_kconsume").toString
    val q = spark.readStream
      .format("graft.sources.KafkaEnvelopeSource")
      .option("bootstrap", bootstrap).option("topic", subject).load()
      .writeStream.format("parquet").option("path", s"$out/rows")
      .option("checkpointLocation", s"$out/ck").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$out/rows")
      .selectExpr("offset", "value").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == (1 to 3).map(i => ((i - 1).toLong, s"""{"n":$i}""")),
      s"the real log serves back exactly what was produced: ${got.toSeq}")
  }

  test("transactional EOS against the real broker: a zombie's uncommitted " +
      "batch aborts, the successor's commit is the only read_committed copy") {
    assume(enabled, "set GRAFT_IT_KAFKA=1 (and docker compose up -d kafka) to run")
    val subject = s"graft.it.eos.${System.nanoTime()}"
    val tid = s"graft-it-eos-${System.nanoTime()}"
    def writer(tag: String) = new KafkaSinkWriter(bootstrap, clientId = tag,
      transactionalId = Some(tid))
    val batch = (1 to 3).map(i =>
      PublishItem(subject, s"e$i", s"""{"n":$i}""", i.toLong))
    val w1 = writer("it-w1")
    batch.foreach(w1.publish) // dies before commit
    val w2 = writer("it-w2") // real coordinator fences w1, aborts its txn
    batch.foreach(w2.publish)
    w2.commit(); w2.close()
    intercept[graft.streaming.PermanentPublishException] { w1.commit() }
    w1.close()
    def consume(isolation: String): Seq[String] = {
      val out = Files.createTempDirectory(s"it_keos_$isolation").toString
      val q = spark.readStream
        .format("graft.sources.KafkaEnvelopeSource")
        .option("bootstrap", bootstrap).option("topic", subject)
        .option("isolation", isolation).load()
        .writeStream.format("parquet").option("path", s"$out/rows")
        .option("checkpointLocation", s"$out/ck").start()
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(s"$out/rows").selectExpr("offset", "value")
        .collect().sortBy(_.getLong(0)).map(_.getString(1)).toSeq
    }
    assert(consume("read_committed") == (1 to 3).map(i => s"""{"n":$i}"""),
      "exactly one committed copy on the real log")
  }

  test("CdcStream with the Kafka sink: WAL lines flow decode -> assemble -> publish -> real acks") {
    assume(enabled, "set GRAFT_IT_KAFKA=1 (and docker compose up -d kafka) to run")
    val tmp = Files.createTempDirectory("graft_it_kafka").toString
    val walDir = s"$tmp/wal"; Files.createDirectories(Paths.get(walDir))
    val ts = "2024-01-15 10:30:00.123456+00"
    def line(a: String, xid: Long, id: Int) = a match {
      case "B" | "C" => s"""{"action":"$a","xid":$xid,"timestamp":"$ts"}"""
      case _ =>
        s"""{"action":"$a","xid":$xid,"timestamp":"$ts","schema":"public","table":"kafka_it","columns":[{"name":"id","type":"bigint","value":$id}]}"""
    }
    Files.write(Paths.get(walDir, "wal-01.log"),
      Seq(line("B", 1, 0), line("I", 1, 1), line("I", 1, 2), line("C", 1, 0))
        .mkString("\n").getBytes(UTF_8))
    val bs = bootstrap
    KafkaIntegrationSpec.acked.set(-1L)
    val raw = spark.readStream.format("graft.sources.WalDirectorySource")
      .option("path", walDir).load()
    val q = graft.streaming.CdcStream.start(spark, raw, "itdb",
      s"$tmp/out", s"$tmp/ck",
      sinkWriter = Some(() => new graft.streaming.SinkWriter {
        private val inner = new KafkaSinkWriter(bs)
        override def publish(item: PublishItem): Unit = {
          inner.publish(item)
          KafkaIntegrationSpec.acked.set(
            math.max(KafkaIntegrationSpec.acked.get(), inner.lastBaseOffset))
        }
        override def close(): Unit = inner.close()
      }))
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (KafkaIntegrationSpec.acked.get() < 1L &&
        q.exception.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      q.exception.foreach(e => throw e)
      assert(KafkaIntegrationSpec.acked.get() >= 1L,
        "both inserts of the committed tx were acked by the real broker")
    } finally q.stop()
  }
}

object KafkaIntegrationSpec {
  /** Highest broker-acked base offset, bridged from the executor-side
    * writer (same JVM under local[*]).
    */
  val acked = new java.util.concurrent.atomic.AtomicLong(-1L)
}
