package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingCuration

/** Staged ingest-time curation funnel (streaming/StreamingCuration.scala):
  * first-seen exact dedup keyed by content digest, then per-source quota
  * admission — each stage's stateful math must equal the window-SQL batch
  * analog that l77_ingest_curation oracle-gates.
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup: first arrival registers, copies flag, replay idempotent") {
    implicit val sctx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val out = StreamingCuration.exactDedupStream(spark,
      input.toDF().toDF("doc_id", "text", "source"), "doc_id", "text", "source")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("scur_dedup").start()
    try {
      input.addData((1L, "alpha", "s1"), (2L, "beta", "s1"))
      q.processAllAvailable()
      // copy of doc 1 in a later batch + replay of doc 1 itself
      input.addData((3L, "alpha", "s2"), (1L, "alpha", "s1"))
      q.processAllAvailable()
      // redelivery of the already-flagged duplicate: emits NOTHING (no
      // .distinct() masking — verdict rows are exactly-once)
      input.addData((3L, "alpha", "s2"))
      q.processAllAvailable()
      val rows = spark.table("scur_dedup")
        .select($"doc_id", $"dup_of").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1)))
      assert(rows.length == rows.distinct.length,
        s"no verdict row is ever emitted twice: ${rows.toList}")
      assert(rows.toMap == Map(1L -> -1L, 2L -> -1L, 3L -> 1L),
        s"owner rows clean, the copy flags its first-seen owner: ${rows.toList}")
    } finally q.stop()
  }

  test("quota: ranks continue across batches; replays don't advance the counter") {
    implicit val sctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val verdicts = input.toDF().toDF("doc_id", "source")
      .withColumn("dup_of", lit(null).cast("long"))
    val out = StreamingCuration.quotaStream(spark, verdicts, quota = 2)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("scur_quota").start()
    try {
      input.addData((1L, "s1"), (2L, "s1")); q.processAllAvailable()
      // rank 3 arrives in a later batch (over quota); a replay of id 2
      // must emit nothing and keep the counter put
      input.addData((3L, "s1"), (2L, "s1")); q.processAllAvailable()
      input.addData((4L, "s2")); q.processAllAvailable()
      val rows = spark.table("scur_quota")
        .select($"doc_id", $"admit_rank", $"admitted").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(rows == Set((1L, 1L, true), (2L, 2L, true), (3L, 3L, false),
        (4L, 1L, true)), s"per-source arrival ranks with cap at 2: $rows")
    } finally q.stop()
  }

  test("quota: a NEW id below the source's high-water mark still gets a verdict") {
    // the dedup stage emits verdicts in arrival order with no per-source
    // doc_id monotonicity across micro-batches — a late low id is a normal
    // NEW candidate, not a replay, and silently dropping it is data loss;
    // replay detection is by id membership, so both coexist
    implicit val sctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val verdicts = input.toDF().toDF("doc_id", "source")
      .withColumn("dup_of", lit(null).cast("long"))
    val out = StreamingCuration.quotaStream(spark, verdicts, quota = 2)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("scur_quota_ooo").start()
    try {
      input.addData((10L, "s1"), (20L, "s1")); q.processAllAvailable()
      // id 5 is NEW but below maxSeen=20; id 10 is a true replay
      input.addData((5L, "s1"), (10L, "s1")); q.processAllAvailable()
      val rows = spark.table("scur_quota_ooo")
        .select($"doc_id", $"admit_rank", $"admitted").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(rows.length == 3, s"replay emits nothing, late-new ranks: ${rows.toList}")
      assert(rows.toSet == Set((10L, 1L, true), (20L, 2L, true),
        (5L, 3L, false)),
        s"the out-of-order NEW id gets the next rank (over quota here): ${rows.toList}")
    } finally q.stop()
  }

  test("sharded quota ≡ serial quota on admits (seeded random, cross-batch)") {
    // the hot-source scale path: shard pre-prune (bounded state) feeding
    // the exact serial stage over survivors only. Property: identical
    // admitted set AND identical admitted ranks vs the serial operator
    // on the same batched arrivals; every definite reject is genuinely
    // over-quota.
    implicit val sctx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val quota = 6L; val shards = 4
    // 3 sources × ~40 candidates, shuffled ids, split into 3 batches
    val arrivals = rnd.shuffle(
      (1 to 120).map(i => (i * 7L % 1000L + i, s"s${i % 3}")).distinct.toList)
    val batches = arrivals.grouped((arrivals.size + 2) / 3).toList

    def runSerial(): Map[Long, (Long, Boolean)] = {
      val in = MemoryStream[(Long, String)]
      val q = StreamingCuration.quotaStream(spark,
        in.toDF().toDF("doc_id", "source")
          .withColumn("dup_of", lit(null).cast("long")), quota)
        .writeStream.outputMode("append")
        .format("memory").queryName("scur_q_serial").start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
        spark.table("scur_q_serial")
          .select($"doc_id", $"admit_rank", $"admitted").collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      } finally q.stop()
    }
    def runSharded(): (Map[Long, (Long, Boolean)], Set[Long]) = {
      val in1 = MemoryStream[(Long, String)]
      val q1 = StreamingCuration.shardQuotaStream(spark,
        in1.toDF().toDF("doc_id", "source")
          .withColumn("dup_of", lit(null).cast("long")), quota, shards)
        .writeStream.outputMode("append")
        .format("memory").queryName("scur_q_shard1").start()
      val stage1 = try {
        batches.foreach { b => in1.addData(b); q1.processAllAvailable() }
        spark.table("scur_q_shard1")
          .select($"doc_id", $"source", $"survivor").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      } finally q1.stop()
      val rejects = stage1.filter(!_._3).map(_._1).toSet
      // stage 2 composes through storage: survivors re-enter in the same
      // batch structure (arrival order preserved per batch)
      val survSet = stage1.filter(_._3).map(_._1).toSet
      val in2 = MemoryStream[(Long, String)]
      val q2 = StreamingCuration.quotaStream(spark,
        in2.toDF().toDF("doc_id", "source")
          .withColumn("dup_of", lit(null).cast("long")), quota)
        .writeStream.outputMode("append")
        .format("memory").queryName("scur_q_shard2").start()
      val exact = try {
        batches.foreach { b =>
          in2.addData(b.filter(t => survSet.contains(t._1)))
          q2.processAllAvailable()
        }
        spark.table("scur_q_shard2")
          .select($"doc_id", $"admit_rank", $"admitted").collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      } finally q2.stop()
      (exact, rejects)
    }

    val serial = runSerial()
    val (sharded, definiteRejects) = runSharded()
    assert(definiteRejects.nonEmpty, "fixture must exercise the shard-reject arm")
    // every candidate is verdicted exactly once across the two stages
    assert(sharded.keySet ++ definiteRejects == serial.keySet)
    assert((sharded.keySet & definiteRejects).isEmpty)
    // definite rejects are genuinely over-quota in the serial run
    definiteRejects.foreach { id =>
      assert(!serial(id)._2, s"doc $id shard-rejected but serially admitted") }
    // admitted set and admitted RANKS are exact
    val serialAdmits = serial.filter(_._2._2)
    val shardedAdmits = sharded.filter(_._2._2)
    assert(shardedAdmits == serialAdmits,
      s"admitted set+ranks must equal the serial path\n serial=$serialAdmits\n sharded=$shardedAdmits")
  }

  test("windowed dedup: a digest expires after the dedup window and re-admits") {
    // opt-in event-time TTL on the digest registry: unseen for the window
    // → the entry is removed (bounded state), and a later holder of the
    // SAME content registers as a fresh owner instead of flagging
    implicit val sctx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    def ts(min: Int) = new java.sql.Timestamp(3600_000L + min * 60_000L)
    val out = StreamingCuration.exactDedupStream(spark,
      input.toDF().toDF("doc_id", "text", "source", "ts"),
      "doc_id", "text", "source",
      eventTimeCol = Some("ts"), dedupWindowMs = Some(10 * 60_000L))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("scur_dedup_ttl").start()
    try {
      input.addData((1L, "alpha", "s1", ts(0))); q.processAllAvailable()
      // inside the window: flags as dup and refreshes the entry
      input.addData((2L, "alpha", "s1", ts(5))); q.processAllAvailable()
      // push the watermark far past the entry's timeout (5min + 10min)
      input.addData((3L, "beta", "s1", ts(60))); q.processAllAvailable()
      // a batch with no alpha arrivals lets the timeout fire and evict
      input.addData((4L, "gamma", "s1", ts(61))); q.processAllAvailable()
      // post-expiry: same content re-registers as a fresh owner
      input.addData((5L, "alpha", "s1", ts(62))); q.processAllAvailable()
      val rows = spark.table("scur_dedup_ttl")
        .select($"doc_id", $"dup_of").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(rows == Map(1L -> -1L, 2L -> 1L, 3L -> -1L, 4L -> -1L,
        5L -> -1L),
        s"dup inside the window, fresh owner after expiry: $rows")
    } finally q.stop()
  }

  test("windowed dedup: a null-ts duplicate keeps the entry's prior timeout (no silent expiry)") {
    // regression: refreshing the event-time timeout from a batch whose
    // arrivals all carry NULL event_ts floored it at watermark+1, so the
    // digest entry expired on the next watermark advance — silently
    // re-admitting later copies. A null-ts batch must keep the prior
    // timeout; the duplicate content stays flagged inside the window.
    implicit val sctx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Option[java.sql.Timestamp])]
    def ts(min: Int) = new java.sql.Timestamp(3600_000L + min * 60_000L)
    val out = StreamingCuration.exactDedupStream(spark,
      input.toDF().toDF("doc_id", "text", "source", "ts"),
      "doc_id", "text", "source",
      eventTimeCol = Some("ts"), dedupWindowMs = Some(10 * 60_000L))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("scur_dedup_nullts").start()
    try {
      input.addData((1L, "alpha", "s1", Some(ts(0)))); q.processAllAvailable()
      // a duplicate WITHOUT an event time: flagged, timeout untouched
      input.addData((2L, "alpha", "s1", None)); q.processAllAvailable()
      // advance the watermark past (old behavior's) watermark+1 floor
      // but well inside alpha's real window end ts(0)+10min
      input.addData((3L, "beta", "s1", Some(ts(5)))); q.processAllAvailable()
      input.addData((4L, "gamma", "s1", Some(ts(6)))); q.processAllAvailable()
      // still inside the window: must flag, not re-register
      input.addData((5L, "alpha", "s1", Some(ts(7)))); q.processAllAvailable()
      val rows = spark.table("scur_dedup_nullts")
        .select($"doc_id", $"dup_of").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(rows == Map(1L -> -1L, 2L -> 1L, 3L -> -1L, 4L -> -1L,
        5L -> 1L),
        s"null-ts arrival must not shorten the dedup window: $rows")
    } finally q.stop()
  }

  test("staged streaming run ≡ the oracle-checked batch analog (l77) on real docs") {
    implicit val sctx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val batchOut = SparkEntry.all("l77_ingest_curation").fn(spark, sfDir)
      .select($"doc_id", $"verdict", $"dup_of", $"admit_rank").collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(batchOut.values.map(_._1).toSet ==
      Set("admit", "reject_quality", "reject_dup", "reject_quota"),
      "fixture exercises all four verdict arms")

    // the same candidate wave l77 synthesizes: originals + exact copies
    val base = graft.queries.Q.t(spark, sfDir, "documents")
    val cand = base.select($"doc_id", $"text", $"source", $"n_chars")
      .unionByName(base.filter($"doc_id" % 7 === 0)
        .select(($"doc_id" + 100000L).as("doc_id"), $"text", $"source",
          $"n_chars"))
    // stage 0 (stateless quality gate) runs before any state is touched
    val passers = cand.withColumn("quality",
        graft.ops.TextAnalysis.qualityScore($"text", $"n_chars"))
      .filter($"quality" > 0.5)
      .select($"doc_id", $"text", $"source")
      .as[(Long, String, String)].collect().sortBy(_._1)

    // stage 1: originals in batch 1, the copy wave in batch 2
    val in1 = MemoryStream[(Long, String, String)]
    val dedup = StreamingCuration.exactDedupStream(spark,
      in1.toDF().toDF("doc_id", "text", "source"), "doc_id", "text", "source")
    val q1 = dedup.writeStream.outputMode("append")
      .format("memory").queryName("scur_stage1").start()
    val stage1 = try {
      in1.addData(passers.filter(_._1 < 100000L).toSeq); q1.processAllAvailable()
      in1.addData(passers.filter(_._1 >= 100000L).toSeq); q1.processAllAvailable()
      spark.table("scur_stage1")
        .select($"doc_id", $"source", $"dup_of").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2)))
    } finally q1.stop()
    assert(stage1.count(_._3 >= 0L) ==
      batchOut.values.count(_._1 == "reject_dup"),
      "stage 1 flags exactly the batch analog's dup set")
    stage1.filter(_._3 >= 0L).foreach { case (id, _, dupOf) =>
      assert(batchOut(id) == (("reject_dup", dupOf, -1L)),
        s"doc $id: dup_of must match the batch analog") }

    // stage 2 composes through storage: stage 1's survivors re-enter as a
    // stream, split mid-range so rank continuation crosses a batch seam
    val surv = stage1.filter(_._3 < 0L).map(t => (t._1, t._2)).sortBy(_._1)
    val mid = surv(surv.length / 2)._1
    val in2 = MemoryStream[(Long, String)]
    val quota = StreamingCuration.quotaStream(spark,
      in2.toDF().toDF("doc_id", "source")
        .withColumn("dup_of", lit(null).cast("long")), quota = 15L)
    val q2 = quota.writeStream.outputMode("append")
      .format("memory").queryName("scur_stage2").start()
    val stage2 = try {
      in2.addData(surv.filter(_._1 <= mid).toSeq); q2.processAllAvailable()
      in2.addData(surv.filter(_._1 > mid).toSeq); q2.processAllAvailable()
      spark.table("scur_stage2")
        .select($"doc_id", $"admit_rank", $"admitted").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    } finally q2.stop()
    assert(stage2.length == surv.length, "every survivor gets a verdict")
    stage2.foreach { case (id, rank, admitted) =>
      val expect = if (admitted) "admit" else "reject_quota"
      assert(batchOut(id) == ((expect, -1L, rank)),
        s"doc $id: quota verdict/rank must match the batch analog " +
          s"(got rank=$rank admitted=$admitted, want ${batchOut(id)})")
    }
  }
}
