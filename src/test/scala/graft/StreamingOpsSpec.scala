package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Reliability

/** Remaining streaming operator surface: watermarked windowed aggregation,
  * session windows, stream-static and stream-stream joins, metrics listener
  * (SURVEY.md §2.2 streaming row).
  */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermarked tumbling-window aggregation over an event stream") {
    implicit val sctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = input.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      input.addData(
        (ts("2024-01-15 10:00:30"), "purchase", 10.0),
        (ts("2024-01-15 10:01:30"), "purchase", 5.0),
        (ts("2024-01-15 10:06:00"), "purchase", 7.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select($"window.start".cast("string"), $"n", $"v").as[(String, Long, Double)]
        .collect().sortBy(_._1)
      assert(rows.toList == List(
        ("2024-01-15 10:00:00", 2L, 15.0), ("2024-01-15 10:05:00", 1L, 7.0)))
    } finally q.stop()
  }

  test("session_window: gap-based sessions close after inactivity") {
    implicit val sctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window($"ts", "10 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sess_out").start()
    try {
      input.addData(
        (ts("2024-01-15 10:00:00"), 1L), (ts("2024-01-15 10:05:00"), 1L),
        (ts("2024-01-15 11:00:00"), 1L)) // > 10 min gap: second session
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 2)
      assert(spark.table("sess_out").agg(sum($"n")).as[Long].collect()(0) == 3)
    } finally q.stop()
  }

  test("stream-static join: dimension enrichment of a CDC stream") {
    implicit val sctx = spark.sqlContext
    val dims = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[(Long, Long)]
    val joined = input.toDF().toDF("event_id", "user_id")
      .join(broadcast(dims), Seq("user_id"), "left")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_out").start()
    try {
      input.addData((10L, 1L), (11L, 3L))
      q.processAllAvailable()
      val m = spark.table("ss_out").select($"event_id", $"tier")
        .as[(Long, Option[String])].collect().toMap
      assert(m == Map(10L -> Some("gold"), 11L -> None))
    } finally q.stop()
  }

  test("stream-stream inner join with watermarks and time bound") {
    implicit val sctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val c = clicks.toDF().toDF("user_id", "click_ts").withWatermark("click_ts", "1 hour")
    val b = buys.toDF().toDF("buy_user", "buy_ts").withWatermark("buy_ts", "1 hour")
    val joined = c.join(b,
      $"user_id" === $"buy_user" &&
        $"buy_ts" >= $"click_ts" && $"buy_ts" <= $"click_ts" + expr("INTERVAL 30 MINUTES"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      clicks.addData((1L, ts("2024-01-15 10:00:00")), (2L, ts("2024-01-15 10:00:00")))
      buys.addData((1L, ts("2024-01-15 10:10:00")), // within bound -> joins
        (2L, ts("2024-01-15 11:30:00")))             // outside 30 min -> dropped
      q.processAllAvailable()
      val rows = spark.table("ssj_out").select($"user_id").as[Long].collect()
      assert(rows.toList == List(1L))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join: null-padded rows emit after watermark") {
    implicit val sctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val c = clicks.toDF().toDF("user_id", "click_ts").withWatermark("click_ts", "10 minutes")
    val b = buys.toDF().toDF("buy_user", "buy_ts").withWatermark("buy_ts", "10 minutes")
    val joined = c.join(b,
      $"user_id" === $"buy_user" &&
        $"buy_ts" >= $"click_ts" && $"buy_ts" <= $"click_ts" + expr("INTERVAL 30 MINUTES"),
      "left_outer")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssoj_out").start()
    try {
      clicks.addData((1L, ts("2024-01-15 10:00:00")), (2L, ts("2024-01-15 10:00:00")))
      buys.addData((1L, ts("2024-01-15 10:10:00"))) // user 2 never buys
      q.processAllAvailable()
      // user 2's null-padded row may not emit until the watermark passes
      // its join window — advance both watermarks far beyond it
      clicks.addData((9L, ts("2024-01-15 13:00:00")))
      buys.addData((9L, ts("2024-01-15 13:00:00")))
      q.processAllAvailable()
      clicks.addData((10L, ts("2024-01-15 15:00:00")))
      buys.addData((10L, ts("2024-01-15 15:00:00")))
      q.processAllAvailable()
      val rows = spark.table("ssoj_out")
        .filter($"user_id".isin(1L, 2L))
        .select($"user_id", $"buy_user").as[(Long, Option[Long])].collect().toSet
      assert(rows == Set((1L, Some(1L)), (2L, None)),
        "matched row joins; unmatched row emits null-padded after eviction")
    } finally q.stop()
  }

  test("streaming curation: gopher filter + exact dedup + langid on a doc stream") {
    // the LLM curation ops are narrow codegen expressions, so the same
    // pipeline runs unchanged over a stream; exact dedup becomes
    // dropDuplicates on the content fingerprint (state-backed)
    implicit val sctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val good = "the quick brown fox jumps over a lazy dog while many other " +
      "animals watch from far away and the sun sets slowly behind tall " +
      "green hills of this quiet valley near an old stone bridge"
    val curated = input.toDF().toDF("doc_id", "text")
      .withColumn("kept", graft.ops.TextAnalysis.gopherFlags($"text")
        .collectFirst { case ("kept", c) => c }.get)
      .filter($"kept")
      .withColumn("fp", graft.ops.TextAnalysis.fingerprintMd5($"text"))
      .dropDuplicates("fp")
      .withColumn("lang", graft.ops.TextAnalysis.langId($"text"))
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("curated_out").start()
    try {
      input.addData((1L, good), (2L, "tiny"), (3L, good))
      q.processAllAvailable()
      input.addData((4L, good + "unique tail here"))
      q.processAllAvailable()
      val rows = spark.table("curated_out")
        .select($"doc_id", $"lang").as[(Long, String)].collect().sortBy(_._1)
      // doc 2 fails gopher min-length; doc 3 is an exact dup of doc 1
      assert(rows.map(_._1).toList == List(1L, 4L))
      assert(rows.forall(_._2 == "en"))
    } finally q.stop()
  }

  test("metrics listener counts batches/rows and terminations (M1)") {
    implicit val sctx = spark.sqlContext
    val registry = new graft.streaming.CdcMetrics.Registry
    val listener = new Reliability.CdcMetricsListener(Some(registry))
    spark.streams.addListener(listener)
    try {
      val input = MemoryStream[Long]
      val q = input.toDF().writeStream.outputMode("append")
        .format("memory").queryName("metrics_out").start()
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
      // listener events are async; give the bus a moment
      var waited = 0
      while (listener.snapshot("input_rows") < 3 && waited < 50) {
        Thread.sleep(100); waited += 1
      }
      val snap = listener.snapshot
      assert(snap("starts") >= 1)
      assert(snap("input_rows") >= 3)
      assert(snap("batches") >= 1)
      // the same progress feeds the Prometheus-named registry
      assert(registry.eventsTotal.get >= 3)
      assert(registry.batchesPublished.get >= 1)
      assert(registry.batchLatency.count >= 1)
    } finally spark.streams.removeListener(listener)
  }
}
