package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDedup

/** Ingest-time streaming near-dup detection: stateful LSH membership over
  * a document stream (streaming/StreamingDedup.scala).
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog in the misty morning light"
  private val textB = "completely unrelated content about distributed query engines and shuffle exchanges"
  private val textC = "a third document with its own distinct vocabulary of culinary techniques and recipes"

  test("exact re-ingest flags against the first-seen doc; distinct docs stay clean; replays are idempotent") {
    implicit val sctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingDedup.nearDupStream(spark,
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_out").start()
    try {
      input.addData((1L, textA), (2L, textB))
      q.processAllAvailable()
      assert(spark.table("sdedup_out").count() == 0,
        "first arrivals only register — no evidence")

      // doc 3 = byte-identical to doc 1 (arrived earlier); doc 4 distinct;
      // doc 1 replayed (same id) must be idempotent
      input.addData((3L, textA), (4L, textC), (1L, textA))
      q.processAllAvailable()
      val ev = spark.table("sdedup_out")
        .select($"doc_id", $"dup_of", $"matches", $"k").distinct().collect()
      assert(ev.map(_.getLong(0)).toSet == Set(3L), s"only doc 3 flagged: ${ev.toList}")
      assert(ev.forall(_.getLong(1) == 1L), "dup_of is the first-seen doc")
      assert(ev.forall(r => r.getInt(2) == r.getInt(3)),
        "byte-identical doc agrees on ALL minhash components")
    } finally q.stop()
  }

  test("maxBucket caps registration but flagged dups keep matching the retained member") {
    implicit val sctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingDedup.nearDupStream(spark,
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", maxBucket = 1)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_cap").start()
    try {
      input.addData((11L, textA))
      q.processAllAvailable()
      input.addData((12L, textA), (13L, textA))
      q.processAllAvailable()
      val ev = spark.table("sdedup_cap").select($"doc_id", $"dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(ev == Set((12L, 11L), (13L, 11L)),
        s"both later copies match the single retained member: $ev")
    } finally q.stop()
  }

  test("single-batch streaming run ≡ the oracle-checked batch analog (l71) on real docs") {
    implicit val sctx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.queries.Q.t(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val out = StreamingDedup.nearDupStream(spark,
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_equiv").start()
    try {
      input.addData(docs.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("sdedup_equiv")
        .groupBy($"doc_id").agg(org.apache.spark.sql.functions.min($"dup_of").as("dup_of"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = graft.SparkEntry.all("l71_ingest_dedup_batch").fn(spark, sfDir)
        .select($"doc_id", $"dup_of")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch.nonEmpty, "fixture must contain planted near-dups")
      assert(streamed == batch,
        s"streaming verdicts must equal the batch analog: " +
          s"stream-only=${streamed -- batch} batch-only=${batch -- streamed}")
    } finally q.stop()
  }

  test("cross-batch state: a dup arriving many batches later still matches") {
    implicit val sctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingDedup.nearDupStream(spark,
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_late").start()
    try {
      input.addData((21L, textA)); q.processAllAvailable()
      input.addData((22L, textB)); q.processAllAvailable()
      input.addData((23L, textC)); q.processAllAvailable()
      input.addData((24L, textA)); q.processAllAvailable()
      val ev = spark.table("sdedup_late").select($"doc_id", $"dup_of").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(ev == Set((24L, 21L)), s"late dup matches the batch-1 member: $ev")
    } finally q.stop()
  }
}
