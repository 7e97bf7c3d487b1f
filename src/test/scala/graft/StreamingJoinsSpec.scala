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

  test("left-outer: an unmatched impression emits its null row only " +
      "after the watermark passes imp_ts + window; matched never null") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx = spark.sqlContext
    val impIn = MemoryStream[(Long, Long, Timestamp)]
    val clkIn = MemoryStream[(Long, Long, Timestamp)]
    val joined = graft.streaming.StreamingJoins.intervalJoin(
      impIn.toDF().toDF("imp_id", "entity", "imp_ts"),
      clkIn.toDF().toDF("click_id", "entity", "click_ts"),
      keyCol = "entity", leftTs = "imp_ts", rightTs = "click_ts",
      windowMinutes = 30L, watermarkDelay = "10 minutes",
      joinType = "left_outer")
    val ckpt = java.nio.file.Files.createTempDirectory("ssjoin_lo_ckpt")
    val q = joined.select($"imp_id", $"click_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("ssjoin_lo_t")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    def rows() = spark.table("ssjoin_lo_t")
      .as[(Long, Option[Long])].collect().toSet
    try {
      // imp 1 will be clicked; imp 2 never will
      impIn.addData((1L, 7L, ts("2024-01-01 10:00:00")),
        (2L, 8L, ts("2024-01-01 10:00:00")))
      clkIn.addData((100L, 7L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      assert(rows() == Set((1L, Some(100L))),
        s"matched pair emits immediately; unmatched stays PENDING " +
          s"(watermark hasn't passed imp_ts+window): ${rows()}")
      // advance both watermarks far past imp_ts + 30min + 10min delay:
      // the undecided imp 2 becomes decided-unmatched and emits ONCE
      // with a null click
      impIn.addData((3L, 9L, ts("2024-01-01 12:00:00")))
      clkIn.addData((101L, 9L, ts("2024-01-01 12:00:01")))
      q.processAllAvailable()
      assert(rows().contains((2L, None)),
        s"decided-unmatched must emit its null row: ${rows()}")
      assert(!rows().contains((1L, None)),
        "a matched impression must never also emit a null row")
    } finally q.stop()
  }

  test("skewed hot key: state stays rate×window-bounded (not corpus-" +
      "bounded) and a below-watermark hot click drops monotone") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx = spark.sqlContext
    val impIn = MemoryStream[(Long, Long, Timestamp)]
    val clkIn = MemoryStream[(Long, Long, Timestamp)]
    val joined = graft.streaming.StreamingJoins.intervalJoin(
      impIn.toDF().toDF("imp_id", "entity", "imp_ts"),
      clkIn.toDF().toDF("click_id", "entity", "click_ts"),
      keyCol = "entity", leftTs = "imp_ts", rightTs = "click_ts",
      windowMinutes = 30L, watermarkDelay = "10 minutes")
    val ckpt = java.nio.file.Files.createTempDirectory("ssjoin_skew_ckpt")
    val q = joined.select($"click_id", $"imp_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("ssjoin_skew_t")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    val base = ts("2024-01-01 10:00:00").getTime
    def at(millis: Long) = new Timestamp(millis)
    val rounds = 6
    val hotPerRound = 60 // entity 7 carries 60% of all impressions
    try {
      (0 until rounds).foreach { r =>
        val t0 = base + r * 3600000L // one hour per round
        // hot entity: 60 impressions inside 5 minutes; cold: 40 distinct
        // entities, one impression each
        val hot = (0 until hotPerRound).map(i =>
          ((r * 1000 + i).toLong, 7L, at(t0 + i * 5000L)))
        val cold = (0 until 40).map(i =>
          ((r * 1000 + 500 + i).toLong, 100L + r * 100 + i, at(t0 + i * 5000L)))
        impIn.addData(hot ++ cold)
        // one hot click per round, 5 minutes in: matches exactly that
        // round's hot impressions (earlier rounds are an hour old — far
        // outside the 30-minute window)
        clkIn.addData((9000L + r, 7L, at(t0 + 300000L)))
        q.processAllAvailable()
      }
      val out = spark.table("ssjoin_skew_t").as[(Long, Long)].collect()
      assert(out.length == rounds * hotPerRound,
        s"each round's click must match exactly its round's hot " +
          s"impressions: ${out.length} vs ${rounds * hotPerRound}")
      assert(out.groupBy(_._1).forall(_._2.length == hotPerRound))
      // THE scale pin: 600 impressions were ingested, but the join state
      // must hold only ~rate×window (the last round or two awaiting
      // watermark passage), never the corpus. Watermark application
      // trails a batch, so allow two rounds + clicks of slack.
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      val ingested = rounds * (hotPerRound + 40)
      assert(stateRows > 0, "join state must exist")
      assert(stateRows <= 2 * (hotPerRound + 40) + 2 * rounds,
        s"hot-key state must stay rate×window-bounded: $stateRows rows " +
          s"retained of $ingested ingested")
      // below-watermark click for the HOT key (round 0 times, hours past
      // the watermark): dropped, monotone — never a wrong or late pair
      clkIn.addData((9999L, 7L, at(base + 600000L)))
      q.processAllAvailable()
      assert(spark.table("ssjoin_skew_t").count() == rounds * hotPerRound,
        "a below-watermark hot click must drop, not emit")
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
