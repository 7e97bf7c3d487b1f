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

  private def ranked(df: org.apache.spark.sql.DataFrame) =
    df.orderBy($"qid", $"rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toList

  test("maintained index: build + serve answers exactly like the inline plan") {
    val name = "graft_rspec_bm25"
    Seq(name, s"${name}_stats", s"${name}_tombstones")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      Retrieval.buildBm25Index(spark, docs, "doc_id", "text", name)
      val q = Seq(1 -> Seq("a", "c"), 2 -> Seq("b"))
      assert(ranked(Retrieval.bm25Serve(spark, name, q, k = 10)) ==
        ranked(Retrieval.bm25TopK(docs, "doc_id", "text", q, k = 10)))
    } finally Seq(name, s"${name}_stats", s"${name}_tombstones")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("rrfFuse: hand-computed fusion, overlap doc wins on two legs") {
    // floor(1e9/61) = 16393442, floor(1e9/62) = 16129032
    val lex = Seq((1, 10L, 1L), (1, 20L, 2L)).toDF("qid", "id", "rank")
    val vec = Seq((1, 20L, 1L), (1, 30L, 2L)).toDF("qid", "id", "rank")
    val out = graft.ops.Retrieval.rrfFuse(Seq(lex, vec), k = 10)
      .orderBy($"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toList
    assert(out == List(
      (1L, 1L, 20L, 16393442L + 16129032L, 2L), // both legs
      (1L, 2L, 10L, 16393442L, 1L),
      (1L, 3L, 30L, 16129032L, 1L)))
  }

  test("phraseServe: overlapping and repeated-word phrases over the positional index") {
    val name = "graft_rspec_phrase"
    Seq(name, s"${name}_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val pdocs = Seq((1L, "b a b a b"), (2L, "x b a y")).toDF("doc_id", "text")
    try {
      Retrieval.buildBm25Index(spark, pdocs, "doc_id", "text", name,
        positional = true)
      val out = Retrieval.phraseServe(spark, name,
          Seq(1 -> Seq("b", "a", "b"), 2 -> Seq("b", "a")))
        .orderBy($"qid", $"id").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
      assert(out == List(
        (1, 1L, 2L), // "b a b a b": anchors 0 and 2 — overlap counts
        (2, 1L, 2L),
        (2, 2L, 1L)))
    } finally Seq(name, s"${name}_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("snippets: rarest-term choice and boundary clamping") {
    val name = "graft_rspec_snip"
    Seq(name, s"${name}_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    // 'b' is everywhere (df=3), 'z' only in d1 (df=1) — the d1 snippet
    // must center on z's FIRST occurrence (position 1), clamped at the
    // left edge; d2 centers on its only query term.
    val sdocs = Seq(
      (1L, "b z c d e f g z b"),
      (2L, "p q r b s t u v w"),
      (3L, "b b b")).toDF("doc_id", "text")
    try {
      Retrieval.buildBm25Index(spark, sdocs, "doc_id", "text", name,
        positional = true)
      val out = Retrieval.snippets(spark, name,
          Seq(1 -> Seq("z", "b")), sdocs, "doc_id", "text",
          k = 3, window = 2)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("snippet"))
        .toMap
      assert(out(1L) == "b z c d") // p=1, start clamps to token 1
      assert(out(2L) == "q r b s t") // full +-2 window around b
      assert(out(3L) == "b b b") // right edge clamps
    } finally Seq(name, s"${name}_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("maintained index takedown: df and corpus stats correct to the surviving corpus") {
    val name = "graft_rspec_bm25_td"
    Seq(name, s"${name}_stats", s"${name}_tombstones")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      Retrieval.buildBm25Index(spark, docs, "doc_id", "text", name)
      // removing d3 changes N (3->2), S (9->5) and df('c') (2->1) — a
      // serve that only filtered d3's postings without the stats/df
      // corrections would score the survivors differently than this
      Retrieval.retractBm25Docs(spark, name,
        docs.filter($"doc_id" === 3L), "doc_id", "text", opId = 1L)
      val q = Seq(1 -> Seq("a", "b", "c"))
      val after = ranked(Retrieval.bm25Serve(spark, name, q, k = 10))
      assert(after ==
        ranked(Retrieval.bm25TopK(docs.filter($"doc_id" =!= 3L),
          "doc_id", "text", q, k = 10)),
        "serve-after-takedown ≡ inline over the remaining corpus")
      assert(after.forall(_._3 != 3L), "the removed doc is never served")
    } finally Seq(name, s"${name}_stats", s"${name}_tombstones")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
