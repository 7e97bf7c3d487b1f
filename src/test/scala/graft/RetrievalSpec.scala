package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curation, Retrieval}

/** BM25 retrieval (rational-idf, integer-exact) + chunking semantics. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a"),
    (2L, "b c"),
    (3L, "c c c c")).toDF("doc_id", "text")

  test("bm25: hand-computed score for a single-term query") {
    // N=3, S=9; term 'a': df=1, tf(d1)=2, dl=3.
    // idf = (2*3 - 2*1 + 1)*1e6 / (2*1 + 1) = 5e6/3
    // num = 22*9*2 = 396; den = 10*9*2 + 3*9 + 9*3*3 = 288
    // floor(5e6/3 * 396 / 288) = 2291666
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(1 -> Seq("a")), k = 10).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("id") == 1L)
    assert(r.getAs[Long]("score_scaled") == 2291666L)
    assert(r.getAs[Long]("rank") == 1L)
    assert(r.getAs[Long]("n_terms") == 1L)
  }

  test("bm25: tf saturation with length norm ranks the denser doc first") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(7 -> Seq("c")), k = 10)
      .orderBy($"rank").select($"id").as[Long].collect().toList
    assert(out == List(3L, 2L), "d3 (tf=4/dl=4) outranks d2 (tf=1/dl=2)")
  }

  test("bm25: multi-term scores are the sum of per-term scores") {
    val both = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(1 -> Seq("a", "b")), k = 10)
      .where($"id" === 1L).select($"score_scaled", $"n_terms")
      .as[(Long, Long)].collect().head
    val a = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(1 -> Seq("a")), k = 10)
      .where($"id" === 1L).select($"score_scaled").as[Long].collect().head
    val b = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(1 -> Seq("b")), k = 10)
      .where($"id" === 1L).select($"score_scaled").as[Long].collect().head
    assert(both == (a + b, 2L))
  }

  test("bm25 plan: stats/df/query frames broadcast, postings exchange reused") {
    val q = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(1 -> Seq("a", "c")), k = 5)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"df/query joins must broadcast:\n${plan.take(1200)}")
    assert(plan.contains("ReusedExchange"),
      s"dfreq must reuse the postings exchange (single corpus scan):\n${plan.take(1200)}")
  }

  test("chunkOverlap: windows, stride, tail clamp") {
    val text50 = (1 to 50).map(i => s"t$i").mkString(" ")
    val out = Curation.chunkOverlap(Seq((9L, text50)).toDF("doc_id", "text"),
        "doc_id", "text", window = 32, stride = 24)
      .orderBy($"chunk_id").collect()
    assert(out.length == 2, "50 tokens, w=32 s=24 -> 2 chunks")
    val c0 = out(0); val c1 = out(1)
    assert(c0.getAs[Long]("n_chunk_tokens") == 32L)
    assert(c1.getAs[Long]("n_chunk_tokens") == 26L, "tail clamped at doc end")
    val toks0 = c0.getAs[String]("chunk_text").split(" ")
    val toks1 = c1.getAs[String]("chunk_text").split(" ")
    assert(toks0.head == "t1" && toks0.last == "t32")
    assert(toks1.head == "t25" && toks1.last == "t50", "overlap of 8 tokens")
    assert((toks0 ++ toks1).toSet == (1 to 50).map(i => s"t$i").toSet)
  }

  test("chunkOverlap: short doc yields exactly one whole-doc chunk") {
    val out = Curation.chunkOverlap(Seq((1L, "x y z")).toDF("doc_id", "text"),
      "doc_id", "text", window = 32, stride = 24).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("chunk_text") == "x y z")
    assert(out.head.getAs[Long]("n_chunk_tokens") == 3L)
  }

  test("chunkOverlap plan: zero shuffles (narrow generator only)") {
    val q = Curation.chunkOverlap(docs, "doc_id", "text", 4, 2)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length +
      "Exchange rangepartitioning".r.findAllIn(plan).length
    assert(shuffles == 0, s"chunking must not shuffle:\n${plan.take(800)}")
  }
}
