package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.Behavior

/** Funnel ordering semantics (a stage event BEFORE the prior stage must
  * not count) and cohort week arithmetic.
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: stages only count at or after the previous stage's reach") {
    val events = Seq(
      // u1 completes the full ordered funnel
      (1L, "signup", ts("2024-01-01 10:00:00"), 1L),
      (1L, "view", ts("2024-01-01 11:00:00"), 2L),
      (1L, "purchase", ts("2024-01-01 12:00:00"), 3L),
      // u2 purchases BEFORE viewing — reaches stage 2, not 3
      (2L, "signup", ts("2024-01-02 10:00:00"), 4L),
      (2L, "purchase", ts("2024-01-02 10:30:00"), 5L),
      (2L, "view", ts("2024-01-02 11:00:00"), 6L),
      // u3 views before signing up — that view must NOT qualify, and no
      // later view exists -> stage 1 only
      (3L, "view", ts("2024-01-03 09:00:00"), 7L),
      (3L, "signup", ts("2024-01-03 10:00:00"), 8L),
      (3L, "purchase", ts("2024-01-03 11:00:00"), 9L),
      // u4 never signs up -> no stage at all
      (4L, "view", ts("2024-01-04 10:00:00"), 10L),
      (4L, "purchase", ts("2024-01-04 11:00:00"), 11L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Behavior.funnel(events, "user_id", "event_type", "ts",
        "event_id", Seq("signup", "view", "purchase"))
      .orderBy($"stage").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toList == List(
      (1L, "signup", 3L, 1000000L),
      (2L, "view", 2L, 666666L),
      (3L, "purchase", 1L, 333333L)))
  }

  test("funnel: ts ties break deterministically on the tie column") {
    // signup and view share a timestamp; view's event_id sorts AFTER ->
    // the view qualifies; flipping the ids disqualifies it
    def run(signupId: Long, viewId: Long) = {
      val events = Seq(
        (1L, "signup", ts("2024-01-01 10:00:00"), signupId),
        (1L, "view", ts("2024-01-01 10:00:00"), viewId))
        .toDF("user_id", "event_type", "ts", "event_id")
      Behavior.funnel(events, "user_id", "event_type", "ts", "event_id",
          Seq("signup", "view"))
        .orderBy($"stage").collect().map(_.getLong(2)).toList
    }
    assert(run(1L, 2L) == List(1L, 1L))
    assert(run(2L, 1L) == List(1L, 0L))
  }

  test("funnel is one window pass: a single exchange on the entity key") {
    val e = spark.read.parquet(s"$sf0001/events.parquet")
      .withColumn("ts", $"ts".cast("timestamp"))
    val plan = Behavior.funnel(e, "user_id", "event_type", "ts", "event_id",
      Seq("signup", "view", "purchase")).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    // one shuffle into user_id for the window+groupBy chain, one single-
    // partition exchange for the global stage rollup (tiny)
    assert(exchanges <= 2, s"$exchanges exchanges:\n${plan.take(1200)}")
    assert(!plan.contains("Join"), "funnel must not self-join")
    // the stage-alphabet pre-filter reaches the parquet scan: at 100 TB
    // the window shuffles only the funnel's event types, not the corpus
    assert(plan.contains("PushedFilters") && plan.contains("In(event_type"),
      plan.take(1500))
  }

  test("funnel deadline: late conversions don't count, on-time ones do") {
    val events = Seq(
      // u1 views 30 min after signup — inside a 1h deadline
      (1L, "signup", ts("2024-01-01 10:00:00"), 1L),
      (1L, "view", ts("2024-01-01 10:30:00"), 2L),
      // u2 views 2h after signup — outside; a later view is ALSO outside
      (2L, "signup", ts("2024-01-02 10:00:00"), 3L),
      (2L, "view", ts("2024-01-02 12:00:00"), 4L),
      (2L, "view", ts("2024-01-02 13:00:00"), 5L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Behavior.funnel(events, "user_id", "event_type", "ts",
        "event_id", Seq("signup", "view"), maxGapSeconds = 3600L)
      .orderBy($"stage").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toList == List((1L, 2L), (2L, 1L)))
    // without the deadline u2 converts too
    val noDl = Behavior.funnel(events, "user_id", "event_type", "ts",
        "event_id", Seq("signup", "view"))
      .orderBy($"stage").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(noDl.toList == List((1L, 2L), (2L, 2L)))
  }

  test("streaming funnel: state advances across micro-batches, monotone") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx = spark.sqlContext
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("funnel_ckpt")
    try {
      val input = MemoryStream[(Long, String, java.sql.Timestamp, Long)]
      val hits = graft.streaming.StreamingFunnel.stageHits(spark,
        input.toDF().toDF("u", "t", "tts", "id"),
        "u", "t", "tts", "id", Seq("signup", "view", "purchase"))
      val q = hits.writeStream.outputMode("append").format("memory")
        .queryName("funnel_hits_t")
        .option("checkpointLocation", ckpt.toString).start()
      try {
        // batch 1: signup, then a purchase BEFORE any view — only the
        // signup advances (stage state = 1 carried into batch 2)
        input.addData((1L, "signup", ts("2024-01-01 10:00:00"), 1L),
          (1L, "purchase", ts("2024-01-01 10:30:00"), 2L))
        q.processAllAvailable()
        val afterB1 = spark.table("funnel_hits_t").select($"stage")
          .as[Long].collect().sorted.toList
        assert(afterB1 == List(1L), s"batch 1 emitted $afterB1")
        // batch 2: view then purchase — both advance, reading the state
        // persisted by batch 1
        input.addData((1L, "view", ts("2024-01-01 11:00:00"), 3L),
          (1L, "purchase", ts("2024-01-01 12:00:00"), 4L))
        q.processAllAvailable()
        val all = spark.table("funnel_hits_t")
          .select($"stage", $"stage_name").collect()
          .map(r => (r.getLong(0), r.getString(1))).sorted.toList
        assert(all == List((1L, "signup"), (2L, "view"), (3L, "purchase")))
      } finally q.stop()
    } finally prev match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming transitions: the last event bridges micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx = spark.sqlContext
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("trans_ckpt")
    try {
      val input = MemoryStream[(Long, String, java.sql.Timestamp, Long)]
      val edges = graft.streaming.StreamingTransitions.edges(spark,
        input.toDF().toDF("u", "t", "tts", "id"), "u", "t", "tts", "id")
      val q = edges.writeStream.outputMode("append").format("memory")
        .queryName("trans_edges_t")
        .option("checkpointLocation", ckpt.toString).start()
      try {
        input.addData((1L, "view", ts("2024-01-01 10:00:00"), 1L),
          (1L, "click", ts("2024-01-01 10:10:00"), 2L))
        q.processAllAvailable()
        // batch 2's first event pairs with batch 1's LAST (from state)
        input.addData((1L, "purchase", ts("2024-01-01 10:20:00"), 3L))
        q.processAllAvailable()
        val out = spark.table("trans_edges_t")
          .select($"from_type", $"to_type").collect()
          .map(r => (r.getString(0), r.getString(1))).sorted.toList
        assert(out == List(("click", "purchase"), ("view", "click")))
      } finally q.stop()
    } finally prev match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("cohort retention plan: one entity window + one rollup, no joins") {
    val e = spark.read.parquet(s"$sf0001/events.parquet")
      .withColumn("ts", $"ts".cast("timestamp"))
    val plan = Behavior.cohortRetention(e, "user_id", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "cohort must not self-join")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 3, s"$exchanges exchanges:\n${plan.take(1200)}")
  }

  test("cohort retention: week arithmetic and distinct entity counting") {
    val events = Seq(
      // u1 first seen Mon Jan 1 week; active that week and 2 weeks later
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-03 10:00:00")), // same week, still one row
      (1L, ts("2024-01-16 10:00:00")),
      // u2 cohorts the same week, active only then
      (2L, ts("2024-01-05 10:00:00")),
      // u3 cohorts the NEXT week (Jan 8)
      (3L, ts("2024-01-08 00:00:00")),
      (3L, ts("2024-01-15 23:59:59")))
      .toDF("user_id", "ts")
    val out = Behavior.cohortRetention(events, "user_id", "ts")
      .orderBy($"cohort_week", $"week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toList == List(
      ("2024-01-01", 0L, 2L),
      ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L),
      ("2024-01-08", 1L, 1L)))
  }
}
