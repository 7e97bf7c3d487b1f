package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, DedupIndex}

/** Incremental dedup over a materialized bucketed shingle index: the
  * growing-corpus path (build once, check each ingest batch, fold it in).
  */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def cleanup(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"DROP TABLE IF EXISTS ${name}_sizes")
  }

  test("incremental near-dups against the index match the batch verify") {
    val name = "graft_test_shidx"
    cleanup(name)
    try {
      val corpus = Seq(
        (1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "completely different content about spark query planning"),
        (3L, "another unrelated document mentioning benchmarks and joins"))
        .toDF("doc_id", "text")
      DedupIndex.build(spark, corpus, "doc_id", "text", name, buckets = 4)

      // batch 2: doc 10 near-dups doc 1 (one token changed), doc 11 is new
      val batch = Seq(
        (10L, "the quick brown fox jumps over the lazy cat today"),
        (11L, "fresh material with no overlap whatsoever here at all"))
        .toDF("doc_id", "text")
      val hits = DedupIndex.incrementalNearDups(spark, batch, "doc_id", "text",
        name, threshold = 0.5)
      val rows = hits.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5))).toList
      assert(rows.map(t => (t._1, t._2)) == List((10L, 1L)), s"got $rows")

      // the jaccard equals the batch-mode exact verify on the union corpus
      val union = corpus.union(batch)
      val sh = Dedup.shingles(union, "doc_id", "text")
      val expected = Dedup.verifyJaccard(sh,
          Seq((1L, 10L)).toDF("id_a", "id_b"))
        .select($"jaccard").as[Double].head()
      assert(math.abs(rows.head._4 - expected) < 1e-12,
        s"incremental ${rows.head._4} vs batch $expected")

      // folding the batch in makes future batches see doc 10
      DedupIndex.append(spark, batch, "doc_id", "text", name, buckets = 4)
      val again = DedupIndex.incrementalNearDups(spark,
        Seq((20L, "the quick brown fox jumps over the lazy cat today"))
          .toDF("doc_id", "text"),
        "doc_id", "text", name, threshold = 0.9)
      val hit2 = again.select($"old_id").as[Long].collect().toSet
      assert(hit2.contains(10L), s"appended doc visible, got $hit2")
    } finally cleanup(name)
  }

  test("the corpus side of the intersection join is the bucketed scan (no corpus exchange)") {
    val name = "graft_test_shidx2"
    cleanup(name)
    try {
      val corpus = (1L to 50L)
        .map(i => (i, s"document number $i talks about topic${i % 7} and topic${i % 11}"))
        .toDF("doc_id", "text")
      DedupIndex.build(spark, corpus, "doc_id", "text", name, buckets = 4)
      val batch = Seq((100L, "document number 3 talks about topic3 and topic3"))
        .toDF("doc_id", "text")
      val df = DedupIndex.incrementalNearDups(spark, batch, "doc_id", "text",
        name, threshold = 0.1)
      df.collect()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(formatted.contains("Bucketed: true"),
        "index scan must use the bucket layout:\n" + formatted.take(1500))
      // hot-shingle guard: df-cap drops everything at maxDf=1 on this corpus
      val capped = DedupIndex.incrementalNearDups(spark, batch, "doc_id",
        "text", name, threshold = 0.0, maxDf = 1)
      assert(capped.count() <= df.count())
    } finally cleanup(name)
  }
}
