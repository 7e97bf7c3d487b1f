package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream interval join: cross-batch state retention (the match
  * l119's staged slices may or may not exercise at small SF, forced
  * here), window bounds, and watermark eviction.
  */
class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("a later-batch click joins an earlier batch's retained impression; " +
      "out-of-window and wrong-entity clicks do not") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx = spark.sqlContext
    val impIn = MemoryStream[(Long, Long, Timestamp)]
    val clkIn = MemoryStream[(Long, Long, Timestamp)]
    val joined = graft.streaming.StreamingJoins.intervalJoin(
      impIn.toDF().toDF("imp_id", "entity", "imp_ts"),
      clkIn.toDF().toDF("click_id", "entity", "click_ts"),
      keyCol = "entity", leftTs = "imp_ts", rightTs = "click_ts",
      windowMinutes = 30L, watermarkDelay = "45 minutes")
    val ckpt = java.nio.file.Files.createTempDirectory("ssjoin_ckpt")
    val q = joined.select($"click_id", $"imp_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("ssjoin_t")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    try {
      // batch 1: impressions only — nothing can emit yet
      impIn.addData((1L, 7L, ts("2024-01-01 10:00:00")),
        (2L, 7L, ts("2024-01-01 10:20:00")),
        (3L, 8L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      assert(spark.table("ssjoin_t").isEmpty)
      // batch 2: the click reaches BACK into batch 1's join state —
      // imp 1 (25 min before, in window) and imp 2 (5 min, in window)
      // match; imp 3 is another entity; a second click 40 min after
      // imp 1 matches only imp 2
      clkIn.addData((100L, 7L, ts("2024-01-01 10:25:00")),
        (101L, 7L, ts("2024-01-01 10:40:00")))
      q.processAllAvailable()
      val out = spark.table("ssjoin_t").as[(Long, Long)]
        .collect().sorted.toList
      assert(out == List((100L, 1L), (100L, 2L), (101L, 2L)),
        s"cross-batch interval matches: $out")
    } finally q.stop()
  }

  test("watermark evicts impressions no future click can reach") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx = spark.sqlContext
    val impIn = MemoryStream[(Long, Long, Timestamp)]
    val clkIn = MemoryStream[(Long, Long, Timestamp)]
    val joined = graft.streaming.StreamingJoins.intervalJoin(
      impIn.toDF().toDF("imp_id", "entity", "imp_ts"),
      clkIn.toDF().toDF("click_id", "entity", "click_ts"),
      keyCol = "entity", leftTs = "imp_ts", rightTs = "click_ts",
      windowMinutes = 30L, watermarkDelay = "45 minutes")
    val ckpt = java.nio.file.Files.createTempDirectory("ssjoin_ev_ckpt")
    val q = joined.select($"click_id", $"imp_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("ssjoin_ev_t")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    try {
      impIn.addData((1L, 7L, ts("2024-01-01 10:00:00")))
      clkIn.addData((99L, 9L, ts("2024-01-01 10:00:00"))) // advance clk wm
      q.processAllAvailable()
      // push both watermarks far past imp_ts + window + delay
      impIn.addData((2L, 7L, ts("2024-01-03 10:00:00")))
      clkIn.addData((98L, 9L, ts("2024-01-03 10:00:00")))
      q.processAllAvailable()
      // a click that WOULD match imp 1 arrives below the watermark: the
      // state is gone and the late row is dropped — monotone under-count,
      // never a wrong pair
      clkIn.addData((100L, 7L, ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      val out = spark.table("ssjoin_ev_t").collect()
      assert(out.isEmpty, s"evicted state must not emit: ${out.toList}")
      // the stateful op reports eviction: removed rows > 0 across the run
      val removed = q.lastProgress.stateOperators.map(_.numRowsRemoved).sum +
        Option(q.recentProgress).toSeq.flatten
          .flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
      assert(removed > 0, "watermark must have evicted join state")
    } finally q.stop()
  }
}
