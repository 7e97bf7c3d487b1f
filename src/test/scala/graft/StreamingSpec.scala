package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{CdcStream, OrderedSink}

/** Streaming pipeline semantics: commit-gated emission from stateful tx
  * assembly, effectively-once via dedup, and checkpointed recovery
  * (reference: engine.go batch loop, cdc_checkpoint_test.go,
  * cdc_recovery_test.go, cdc_dedup_test.go).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  def walLine(ws: Long, action: String, xid: Long, table: String = "users", id: Int = 0): (Long, String) = {
    val ts = "2024-01-15 10:30:00.123456+00"
    val data = action match {
      case "B" | "C" => s"""{"action":"$action","xid":$xid,"timestamp":"$ts"}"""
      case a =>
        s"""{"action":"$a","xid":$xid,"timestamp":"$ts","schema":"public","table":"$table","columns":[{"name":"id","type":"bigint","value":$id}]}"""
    }
    (ws, data)
  }

  test("tx assembly emits only on commit; abandoned tx emits nothing") {
    implicit val sctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val events = CdcStream.pipeline(spark, input.toDF().toDF("wal_start", "data"), "testdb")
    val q = events.writeStream.outputMode("append")
      .format("memory").queryName("txassembly_out").start()
    try {
      // tx 1 begins but never commits; tx 2 commits
      input.addData(walLine(1, "B", 1), walLine(2, "I", 1, id = 11))
      q.processAllAvailable()
      assert(spark.table("txassembly_out").count() == 0, "no commit -> no emit")
      input.addData(walLine(3, "B", 2), walLine(4, "I", 2, id = 21),
        walLine(5, "I", 2, id = 22), walLine(6, "C", 2))
      q.processAllAvailable()
      val out = spark.table("txassembly_out").orderBy($"event_id")
      assert(out.count() == 2, "committed tx emits all its events")
      assert(out.select($"txid").distinct().as[Long].collect().toList == List(2L))
      // distinct seq within the tx -> distinct event ids
      assert(out.select($"event_id").distinct().count() == 2)
      // late commit of tx 1 releases its buffered events
      input.addData(walLine(7, "C", 1))
      q.processAllAvailable()
      assert(spark.table("txassembly_out").filter($"txid" === 1).count() == 1)
    } finally q.stop()
  }

  test("replayed events dedup within the watermark (effectively-once, E7)") {
    implicit val sctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val events = CdcStream.pipeline(spark, input.toDF().toDF("wal_start", "data"), "testdb")
    val q = events.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      val tx = Seq(walLine(10, "B", 5), walLine(11, "I", 5, id = 1), walLine(12, "C", 5))
      input.addData(tx: _*)
      q.processAllAvailable()
      input.addData(tx: _*) // at-least-once redelivery of the whole tx
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 1,
        "deterministic event_id collapses the replay")
    } finally q.stop()
  }

  test("checkpointed recovery: restart resumes without reprocessing (C1/C2)") {
    val dir = Files.createTempDirectory("graft_stream").toString
    val src = s"$dir/in"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Seq(walLine(1, "B", 1), walLine(2, "I", 1, id = 1), walLine(3, "C", 1))
      .toDF("wal_start", "data").write.json(s"$src/batch0.json")

    val schema = "wal_start LONG, data STRING"
    def startQuery() = CdcStream.start(spark,
      spark.readStream.schema(schema).json(s"$src/*.json"), "testdb",
      out, ckpt, trigger = Trigger.ProcessingTime("50 milliseconds"))

    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst == 1)

    // second run: new data only; the first file must not be reprocessed
    Seq(walLine(4, "B", 2), walLine(5, "I", 2, id = 2), walLine(6, "C", 2))
      .toDF("wal_start", "data").write.json(s"$src/batch1.json")
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()
    val all = spark.read.parquet(out)
    assert(all.count() == 2, "exactly one new event after restart")
    assert(all.select($"txid").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("ordered sink writes per-subject sorted, idempotent batches (E2/E6)") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val batch = Seq(
      ("b:1", "cdc.db.public.b", "0/5", java.sql.Timestamp.valueOf("2024-01-15 10:30:01")),
      ("a:2", "cdc.db.public.a", "0/9", java.sql.Timestamp.valueOf("2024-01-15 10:30:02")),
      ("a:1", "cdc.db.public.a", "0/3", java.sql.Timestamp.valueOf("2024-01-15 10:30:00")))
      .toDF("event_id", "subject", "lsn", "commit_time")
    OrderedSink.writeBatch(batch, 7, dir, numPartitions = 2)
    OrderedSink.writeBatch(batch, 7, dir, numPartitions = 2) // redelivery: overwrite, not append
    val written = spark.read.parquet(s"$dir/batch_id=7")
    assert(written.count() == 3, "batch rewrite is idempotent")
  }
}
