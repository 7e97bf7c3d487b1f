package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.SnapshotBootstrap

/** Snapshot bootstrap + LSN handoff (SURVEY S1): initial load union
  * incremental stream reconstructs the full table state with no
  * duplicates and no gaps.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def walLine(ws: Long, action: String, xid: Long, id: Int): (Long, String) = {
    val payload = action match {
      case "B" => s"""{"action":"B","xid":$xid,"timestamp":"2024-01-15 10:30:00.000000+00"}"""
      case "C" => s"""{"action":"C","xid":$xid,"timestamp":"2024-01-15 10:30:01.000000+00"}"""
      case a =>
        s"""{"action":"$a","xid":$xid,"schema":"public","table":"users",
           |"columns":[{"name":"id","type":"integer","value":$id}]}""".stripMargin.replace("\n", "")
    }
    (ws, payload)
  }

  test("snapshot events carry the envelope schema and deterministic ids") {
    val users = Seq((1, "ada"), (2, "bob")).toDF("id", "name")
    val ev = SnapshotBootstrap.snapshotEvents(users, "testdb", "public", "users",
      snapshotLsn = 100L, keyCols = Seq("id"),
      snapshotTime = java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    val rows = ev.orderBy($"event_id").collect()
    assert(rows.length == 2)
    val r = ev.filter($"event_id".endsWith(":1")).head()
    assert(r.getAs[String]("event_id") == "snapshot:0/64:public.users:1")
    assert(r.getAs[String]("operation") == "SNAPSHOT")
    assert(r.getAs[String]("subject") == "cdc.testdb.public.users")
    assert(r.getAs[Map[String, String]]("after") == Map("id" -> "1", "name" -> "ada"))
    assert(r.getAs[Map[String, String]]("before") == null)
    // re-running the snapshot produces identical ids -> sink idempotence
    val again = SnapshotBootstrap.snapshotEvents(users, "testdb", "public", "users",
      100L, Seq("id"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(again.select($"event_id").as[String].collect().sorted.toList ==
      ev.select($"event_id").as[String].collect().sorted.toList)
  }

  test("snapshot + incremental = full state, no dupes across the handoff") {
    implicit val sctx = spark.sqlContext
    // table state at the consistent point (LSN 20): ids 1,2,3
    val snapshot = Seq((1, "ada"), (2, "bob"), (3, "cyd")).toDF("id", "name")
    // WAL: a tx at LSN <= 20 (already IN the snapshot — must not replay)
    // and a tx after it inserting ids 4,5
    val input = MemoryStream[(Long, String)]
    input.addData(
      walLine(10, "B", 1, 0), walLine(11, "I", 1, 3), walLine(12, "C", 1, 0),
      walLine(30, "B", 2, 0), walLine(31, "I", 2, 4), walLine(32, "I", 2, 5),
      walLine(33, "C", 2, 0))
    val out = Files.createTempDirectory("graft_snap_out").toString
    val ckpt = Files.createTempDirectory("graft_snap_ckpt").toString
    val q = SnapshotBootstrap.bootstrap(spark, snapshot,
      input.toDF().toDF("wal_start", "data"), "testdb", "public", "users",
      snapshotLsn = 20L, keyCols = Seq("id"), out, ckpt)
    try q.processAllAvailable() finally q.stop()

    val all = spark.read.parquet(out)
    // ids: 1,2,3 from the snapshot; 4,5 from the stream; id 3's WAL insert
    // (LSN 11 <= 20) must NOT replay — it is already in the snapshot
    val ids = all.select(coalesce(
      element_at($"after", "id"),
      // snapshot rows carry the full image in after too
      lit(null)).cast("int").as("id"))
      .as[Int].collect().sorted.toList
    assert(ids == List(1, 2, 3, 4, 5), s"got $ids")
    assert(all.select($"event_id").distinct().count() == 5)
    val ops = all.groupBy($"operation").count().as[(String, Long)].collect().toMap
    assert(ops == Map("SNAPSHOT" -> 3L, "INSERT" -> 2L))
  }
}
