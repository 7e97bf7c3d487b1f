package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.WalDirectorySource
import graft.streaming.CdcStream

/** Custom DSv2 micro-batch source: segment ordering, LSN-shaped positions,
  * standby-feedback commit ledger, checkpoint recovery; plus the SQL UDF
  * surface.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def writeSegment(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name),
      String.join("\n", lines: _*).getBytes("UTF-8"))

  val ts = "2024-01-15 10:30:00.123456+00"
  def wal(a: String, xid: Long, id: Int = 0): String = a match {
    case "B" | "C" => s"""{"action":"$a","xid":$xid,"timestamp":"$ts"}"""
    case _ => s"""{"action":"I","xid":$xid,"timestamp":"$ts","schema":"public","table":"t","columns":[{"name":"id","type":"bigint","value":$id}]}"""
  }

  test("source reads segments in name order with LSN-shaped wal_start") {
    val dir = Files.createTempDirectory("walsrc").toString
    writeSegment(dir, "seg000", Seq(wal("B", 1), wal("I", 1, 11)))
    writeSegment(dir, "seg001", Seq(wal("C", 1)))
    val q = spark.readStream.format("graft.sources.WalDirectorySource")
      .option("path", dir).load()
      .writeStream.outputMode("append").format("memory").queryName("walsrc_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("walsrc_out").orderBy($"wal_start")
        .as[(Long, String)].collect()
      assert(rows.length == 3)
      // file 0 lines 0,1; file 1 line 0 -> high 32 bits = file index
      assert(rows.map(_._1).toList == List(0L, 1L, (1L << 32) | 0L))
    } finally q.stop()
  }

  test("commit writes the standby-feedback ledger (_acked), lagging one batch") {
    val dir = Files.createTempDirectory("walack").toString
    writeSegment(dir, "seg000", Seq(wal("B", 1), wal("I", 1, 5), wal("C", 1)))
    val q = spark.readStream.format("graft.sources.WalDirectorySource")
      .option("path", dir).load()
      .writeStream.outputMode("append").format("memory").queryName("walack_out").start()
    try {
      q.processAllAvailable()
      // the engine commits batch N on the source while planning batch N+1 —
      // same shape as the reference, where the standby ack for a message is
      // sent after its publish completes (reader.go:594-605). Force the
      // next batch by appending a segment.
      writeSegment(dir, "seg001", Seq(wal("B", 2), wal("C", 2)))
      q.processAllAvailable()
    } finally q.stop()
    val acked = WalDirectorySource.ackedPositions(dir)
    assert(acked.nonEmpty, "commit() must append to the ack ledger")
    assert(acked.head.contains("\"fileCount\":1"))
  }

  test("ack ledger is monotonic: a lower or equal ack is ignored (reader_acked_test.go:20-37)") {
    val dir = Files.createTempDirectory("walackmono").toString
    Files.createDirectories(java.nio.file.Paths.get(dir))
    val stream = new graft.sources.WalMicroBatchStream(dir)
    stream.commit(graft.sources.WalOffset(2))
    stream.commit(graft.sources.WalOffset(4))
    stream.commit(graft.sources.WalOffset(3)) // regression: ignored
    stream.commit(graft.sources.WalOffset(4)) // duplicate: ignored
    stream.commit(graft.sources.WalOffset(5))
    val acked = WalDirectorySource.ackedPositions(dir)
    assert(acked.map(l => """\d+""".r.findFirstIn(l).get.toInt) == Seq(2, 4, 5),
      s"confirmed_flush can only advance: $acked")
  }

  test("end-to-end: custom source -> CDC pipeline -> ordered sink, with restart") {
    val dir = Files.createTempDirectory("wale2e").toString
    val out = s"$dir/out"; val ckpt = s"$dir/ckpt"; val in = s"$dir/in"
    Files.createDirectories(Paths.get(in))
    writeSegment(in, "seg000", Seq(wal("B", 1), wal("I", 1, 11), wal("C", 1)))

    def run(): Unit = {
      val raw = spark.readStream.format("graft.sources.WalDirectorySource")
        .option("path", in).load()
      val q = CdcStream.start(spark, raw, "srcdb", out, ckpt)
      q.processAllAvailable(); q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 1)
    // new segment after restart: only the new transaction is processed
    writeSegment(in, "seg001", Seq(wal("B", 2), wal("I", 2, 21), wal("C", 2)))
    run()
    val all = spark.read.parquet(out)
    assert(all.count() == 2)
    assert(all.select($"txid").as[Long].collect().toSet == Set(1L, 2L))
    // the ack ledger lags one batch (commit fires when the next batch is
    // planned): after the second run it has acknowledged the first segment.
    assert(WalDirectorySource.ackedPositions(in).last.contains("\"fileCount\":1"))
  }

  test("SQL UDF surface matches the Column API") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql("""SELECT
        graft_lsn(4294967296 + 10) AS lsn,
        graft_event_id('0/a', 7, 'INSERT', 'public', 'users', 3) AS eid,
        graft_subject('db', 'public', 'users') AS subj,
        graft_hash48('abc') AS h,
        graft_event_type('DELETE') AS et,
        graft_sanitize_token('a b*c>d') AS tok""").collect()(0)
    assert(r.getAs[String]("lsn") == "1/a")
    assert(r.getAs[String]("eid") == "0/a:7:INSERT:public.users:3")
    assert(r.getAs[String]("subj") == "cdc.db.public.users")
    assert(r.getAs[Long]("h") == 158335321521362L)
    assert(r.getAs[String]("et") == "cdc.delete")
    assert(r.getAs[String]("tok") == "a_b_c_d")
  }

  test("maxFilesPerTrigger rate-limits admission (backpressure analog)") {
    val dir = Files.createTempDirectory("wallimit").toString
    (0 until 5).foreach(i =>
      writeSegment(dir, f"seg$i%03d", Seq(wal("I", i.toLong, i))))
    val q = spark.readStream.format("graft.sources.WalDirectorySource")
      .option("path", dir).option("maxFilesPerTrigger", "2").load()
      .writeStream.outputMode("append").format("memory")
      .queryName("wallimit_out").start()
    try {
      q.processAllAvailable()
      val sq = q.asInstanceOf[org.apache.spark.sql.streaming.StreamingQuery]
      val batches = sq.recentProgress.filter(_.numInputRows > 0)
      assert(spark.table("wallimit_out").count() == 5)
      // 5 segments at <=2 per trigger -> at least 3 non-empty micro-batches
      assert(batches.length >= 3,
        s"expected >=3 rate-limited batches, got ${batches.length}")
      assert(batches.forall(_.numInputRows <= 2))
    } finally q.stop()
  }
}
