package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sparse-lexical retrieval over the document corpus: BM25 top-k through
  * an inverted-index shape (term -> postings), the classic companion to
  * the embedding ANN operators in [[Similarity]].
  *
  * Engine-portable scoring: classic BM25 multiplies a log-idf by a
  * saturated-tf term. `ln` is a transcendental whose last-ulp rounding is
  * libm-specific, so cross-engine hash parity (and partition-order-stable
  * results generally) cannot use it. We keep the Robertson idf as the
  * exact *rational* (N - df + 0.5)/(df + 0.5) = (2N-2df+1)/(2df+1) scaled
  * by 1e6, and clear the tf fraction tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
  * of its constants (k1=1.2, b=0.75, avgdl=S/N) by multiplying through by
  * 10*S: every intermediate is then either an exact BIGINT or a single
  * correctly-rounded IEEE multiply/divide — bit-identical in any engine —
  * and the per-term score is floored to a BIGINT so the final per-doc SUM
  * is integer-exact and independent of partitioning / summation order.
  *
  * Scale shape (100 TB): the postings build is one shuffle on
  * (doc, term), map-side pre-filtered to query vocabulary (the `isin`
  * reaches the generator output, so non-query terms never enter the
  * exchange); document-frequency stats aggregate the *same* exchange
  * (ReuseExchange — the corpus is scanned once) and come back broadcast;
  * the query table and corpus stats are broadcast 1-row/tiny frames; the
  * final top-k is a window partitioned by query id over candidate docs
  * only. No all-pairs, no driver collect.
  */
object Retrieval {

  /** BM25 top-k (rational-idf variant, integer-exact ranking).
    *
    * @param queries (query_id, terms) — the query workload, broadcast.
    * @return (qid, rank, id, score_scaled, n_terms): top `k` docs per
    *         query by descending score (idf scaled by 1e6), doc id as the
    *         deterministic tie-break.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, Seq[String])], k: Int = 10): DataFrame = {
    require(queries.nonEmpty, "queries must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._

    val qdf = queries.flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("qid", "term")
    val terms = queries.flatMap(_._2).distinct

    val base = docs.select(col(idCol).as("id"),
        split(col(textCol), " ").as("t"))
      .withColumn("dl", size(col("t")).cast("long"))
    val stats = base.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))

    // Postings restricted to query vocabulary, repartitioned on
    // (doc, term): the single materialization point (ReuseExchange) both
    // the tf and the df aggregations consume — the corpus is scanned
    // once, and the (doc, term) key spreads hot terms across tasks
    // (partitioning by term alone would put a stop-word's postings in one
    // task). The tf groupBy needs no further exchange: (id, term) is a
    // subset of its grouping keys.
    val postings = base
      .select(col("id"), col("dl"), explode(col("t")).as("term"))
      .filter(col("term").isin(terms: _*))
      .repartition(col("id"), col("term"))
    val tf = postings.groupBy("id", "dl", "term").agg(count(lit(1)).as("tf"))
    // Document frequency: a second, tiny shuffle of the aggregated tf.
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))

    rankBm25(tf, qdf, dfreq, stats, k)
  }

  /** Shared scoring tail: per-term integer-exact BM25 scores, per-doc
    * sums, windowed top-k. `tf` rows are (id, dl, term, tf) candidate
    * postings (already restricted to query vocabulary); `dfreq`/`qdf`/
    * `stats` are tiny frames and broadcast here. Both [[bm25TopK]] and
    * [[bm25Serve]] end in this exact plan, which is what makes
    * serve-from-the-maintained-index ≡ inline-over-the-same-corpus a
    * bit-for-bit property rather than an approximation.
    */
  private def rankBm25(tf: DataFrame, qdf: DataFrame, dfreq: DataFrame,
      stats: DataFrame, k: Int): DataFrame = {
    // idf = ((2N - 2df + 1) * 1e6) / (2df + 1)    (one IEEE division)
    // tf-part (x10S): 22*S*tf / (10*S*tf + 3*S + 9*dl*N)  (exact BIGINTs)
    val idf = ((lit(2L) * col("n_docs") - lit(2L) * col("df") + lit(1L)) *
      lit(1000000.0)) / (lit(2L) * col("df") + lit(1L))
    val num = lit(22L) * col("sum_dl") * col("tf")
    val den = lit(10L) * col("sum_dl") * col("tf") + lit(3L) * col("sum_dl") +
      lit(9L) * col("dl") * col("n_docs")

    val scored = tf
      .join(broadcast(dfreq), "term")
      .join(broadcast(qdf), "term")
      .crossJoin(broadcast(stats))
      .withColumn("score_i", floor(idf * num / den))

    val totals = scored.groupBy("qid", "id")
      .agg(sum("score_i").as("score_scaled"), count(lit(1)).as("n_terms"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_scaled").desc, col("id"))
    totals.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("score_scaled"),
        col("n_terms"))
  }

  // ---------- maintained BM25 index lifecycle (stream → compact → serve)

  /** Full-vocabulary postings for a document slice: (id, dl, term, tf),
    * one row per (doc, distinct term) — the stored form of the inverted
    * index. tf is final per row because ingest semantics give each doc id
    * to exactly ONE batch (the [[DedupIndex]] contract); serve never
    * re-aggregates term frequencies. With `positional` the row carries
    * the sorted 0-based token positions too (|positions| = tf) — the
    * classic positional-index space trade that buys [[phraseServe]].
    */
  private def postingsOf(docs: DataFrame, idCol: String,
      textCol: String, positional: Boolean = false): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        split(col(textCol), " ").as("t"))
      .withColumn("dl", size(col("t")).cast("long"))
    if (positional)
      toks.select(col("id"), col("dl"),
          posexplode(col("t")).as(Seq("pos", "term")))
        .groupBy("id", "dl", "term")
        .agg(count(lit(1)).as("tf"),
          sort_array(collect_list(col("pos"))).as("positions"))
    else
      toks.select(col("id"), col("dl"), explode(col("t")).as("term"))
        .groupBy("id", "dl", "term").agg(count(lit(1)).as("tf"))
  }

  /** STREAMING maintenance of a bucketed BM25 index — the lexical twin of
    * [[Similarity.startIvfPqMaintenance]]. Each micro-batch lands two
    * tables through the replay-idempotent drop+append loop
    * ([[DedupIndex.landBatch]]):
    *  - `<name>`       : postings (id, dl, term, tf), bucketed by `term`
    *                     so the serve path's query-vocabulary restriction
    *                     prunes to the buckets holding those terms;
    *  - `<name>_stats` : ONE row per batch (n_docs, sum_dl) — corpus
    *                     stats maintained as per-batch partials summed at
    *                     serve time (a tiny table: rows = batches), never
    *                     recomputed from the corpus.
    * Unlike the ANN lifecycle there is nothing to freeze: BM25's only
    * corpus-dependent state (df, N, S) is derived at serve time from the
    * index itself, so it is always current with the ingested corpus.
    * Compact with [[compactBm25Index]].
    */
  def startBm25Maintenance(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String, name: String, checkpointPath: String,
      buckets: Int = 8,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val post = postingsOf(batch.toDF(), idCol, textCol)
          .withColumn("ingest_batch", lit(batchId))
        val stats = batch.toDF()
          .select(size(split(col(textCol), " ")).cast("long").as("dl"))
          .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
          .withColumn("ingest_batch", lit(batchId))
        DedupIndex.landBatch(s, spark, post, name, batchId,
          bucketed = true, buckets, bucketCol = "term")
        DedupIndex.landBatch(s, spark, stats, s"${name}_stats", batchId,
          bucketed = false, buckets)
      }.start()

  /** Batch build of the maintained-serve layout — the build-once
    * counterpart of [[startBm25Maintenance]] (everything lands as
    * `ingest_batch=0` through the same idempotent protocol, so a later
    * maintenance stream can append to it directly).
    */
  def buildBm25Index(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, name: String, buckets: Int = 8,
      positional: Boolean = false): Unit = {
    DedupIndex.landBatch(spark, spark,
      postingsOf(docs, idCol, textCol, positional)
        .withColumn("ingest_batch", lit(0L)),
      name, 0L, bucketed = true, buckets, bucketCol = "term")
    DedupIndex.landBatch(spark, spark,
      docs.select(size(split(col(textCol), " ")).cast("long").as("dl"))
        .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
        .withColumn("ingest_batch", lit(0L)),
      s"${name}_stats", 0L, bucketed = false, buckets)
  }

  /** Size-tiered compaction of the maintained postings — identical
    * lifecycle guarantees to [[DedupIndex.compact]] (manifest crash
    * recovery, folded-batch replay skip, O(log M) rewrites per row),
    * over the `term` bucket column. The stats table stays per-batch
    * rows: at one row per ingest batch it is never worth rewriting.
    */
  def compactBm25Index(spark: SparkSession, name: String,
      buckets: Int = 8, tierFanout: Int = 8): Unit =
    DedupIndex.compactTable(spark, name, bucketed = true, "term",
      buckets, tierFanout)

  /** TAKEDOWN for the maintained BM25 index: removal requests land as
    * (id, dl) tombstones via the idempotent partition protocol and
    * [[bm25Serve]] corrects for them — postings anti-join the broadcast
    * tombstone set (which also fixes df, since df counts surviving
    * postings), and (N, S) subtract the tombstones' (count, Σdl).
    * Deletion is logical immediately — the bucketed layout is never
    * rewritten per request — and physical at the next compaction-era
    * rebuild. dl is captured HERE (from the takedown request's document
    * text) so the serve-path correction never scans the doc-id-unordered
    * postings for the removed ids.
    */
  def retractBm25Docs(spark: SparkSession, name: String, docs: DataFrame,
      idCol: String, textCol: String, opId: Long): Unit =
    DedupIndex.landBatch(spark, spark,
      docs.select(col(idCol).as("id"),
          size(split(col(textCol), " ")).cast("long").as("dl"))
        .withColumn("ingest_batch", lit(opId)),
      s"${name}_tombstones", opId, bucketed = false, 8)

  /** Reciprocal-rank fusion (the published RRF recipe: score(d) =
    * Σ_legs 1/(K + rank_leg(d)), K = 60) of N ranked retrieval legs —
    * the standard hybrid-retrieval combiner for a lexical ([[bm25Serve]])
    * plus a vector ([[Similarity.ivfPqServe]]) leg. Each leg is
    * (qid, id, rank); contributions are floor(1e9 / (K + rank)) — one
    * IEEE division of exact small integers, so the fused ordering is
    * engine-exact like the BM25 scores themselves.
    *
    * Scale shape: legs are top-k frames (|queries| × k rows — the
    * corpus-sized work already happened inside each index's serve), so
    * fusion is a union + one tiny aggregation; cost is independent of
    * corpus size by construction.
    */
  def rrfFuse(legs: Seq[DataFrame], k: Int = 10, kRrf: Int = 60)
      : DataFrame = {
    require(legs.nonEmpty, "need at least one ranked leg")
    val all = legs.map(_.select(col("qid").cast("long").as("qid"),
        col("id").cast("long").as("id"), col("rank").cast("long").as("rank")))
      .reduce(_ unionByName _)
      .withColumn("rrf_i",
        floor(lit(1000000000.0) / (lit(kRrf.toLong) + col("rank")))
          .cast("long"))
    val tot = all.groupBy("qid", "id")
      .agg(sum("rrf_i").as("rrf_score"), count(lit(1)).as("n_legs"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_score").desc, col("id"))
    tot.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("rrf_score"),
        col("n_legs"))
  }

  /** Serve BM25 top-k from the MAINTAINED index. The scan reads only the
    * term buckets the query vocabulary hashes into (bucket pruning on the
    * `isin`); df aggregates the pruned candidate postings (tiny — query
    * vocab only); corpus stats sum the per-batch partials table; both
    * come back broadcast into [[rankBm25]]'s exact inline plan. With a
    * tombstone table present, candidates anti-join the broadcast removal
    * set and stats subtract its (count, Σdl) — serving exactly as if the
    * index never contained those docs. Tombstones are distinct-by-id
    * first, so re-retracting a doc cannot double-subtract.
    */
  def bm25Serve(spark: SparkSession, name: String,
      queries: Seq[(Int, Seq[String])], k: Int = 10): DataFrame = {
    require(queries.nonEmpty, "queries must be non-empty")
    import spark.implicits._
    val qdf = queries.flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("qid", "term")
    val terms = queries.flatMap(_._2).distinct

    val post0 = spark.table(name).drop("ingest_batch")
      .filter(col("term").isin(terms: _*))
    val tomb =
      if (spark.catalog.tableExists(s"${name}_tombstones"))
        Some(spark.table(s"${name}_tombstones")
          .select(col("id"), col("dl")).distinct())
      else None
    val post = tomb.fold(post0)(tb =>
      post0.join(broadcast(tb.select(col("id"))), Seq("id"), "left_anti"))

    val dfreq = post.groupBy("term").agg(count(lit(1)).as("df"))
    val statsAll = spark.table(s"${name}_stats")
      .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
    val stats = tomb.fold(statsAll) { tb =>
      val rm = tb.agg(count(lit(1)).as("rm_n"), sum("dl").as("rm_dl"))
      statsAll.crossJoin(rm)
        .select((col("n_docs") - col("rm_n")).as("n_docs"),
          (col("sum_dl") - coalesce(col("rm_dl"), lit(0L))).as("sum_dl"))
    }
    rankBm25(post, qdf, dfreq, stats, k)
  }

  /** Exact phrase search over a POSITIONAL maintained index
    * ([[buildBm25Index]]/[[startBm25Maintenance]] with
    * `positional = true`): returns (qid, id, n_matches) — every doc
    * containing each phrase as consecutive tokens, with its occurrence
    * count. The anchor trick makes it one join + one aggregation: a
    * posting of phrase word k at position p proposes anchor p − k, and
    * an anchor where ALL phrase slots 0..n−1 are proposed is a match —
    * repeated words in the phrase fall out naturally because slots are
    * matched by index k, not by distinct term.
    *
    * Scale shape: the scan is pruned to the phrase vocabulary's term
    * buckets (same `isin` bucket pruning as [[bm25Serve]]); the phrase
    * table broadcasts; the only exchange is the (qid, id, anchor)
    * aggregation over candidate postings. The corpus is never rescanned
    * and non-phrase terms are never read.
    */
  def phraseServe(spark: SparkSession, name: String,
      phrases: Seq[(Int, Seq[String])]): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_._2.nonEmpty),
      "phrases must be non-empty")
    import spark.implicits._
    val pdf = phrases.flatMap { case (qid, ws) =>
      ws.zipWithIndex.map { case (w, k) => (qid, k, w, ws.length) }
    }.toDF("qid", "k", "term", "plen")
    val words = phrases.flatMap(_._2).distinct
    val post = spark.table(name).drop("ingest_batch")
      .filter(col("term").isin(words: _*))
      .select(col("id"), col("term"), explode(col("positions")).as("pos"))
    post.join(broadcast(pdf), "term")
      .groupBy(col("qid"), col("id"), (col("pos") - col("k")).as("anchor"),
        col("plen"))
      .agg(countDistinct(col("k")).as("nk"))
      .filter(col("nk") === col("plen"))
      .groupBy("qid", "id").agg(count(lit(1)).as("n_matches"))
      .select(col("qid"), col("id"), col("n_matches"))
  }

  /** Keyword-in-context snippets for the top-k BM25 results: serve the
    * queries from the maintained POSITIONAL index, pick each hit's most
    * distinctive matching term (lowest df, term tie-break — the rarest
    * word is the one worth showing), and cut a ±`window`-token extract
    * around its first occurrence. Returns (qid, rank, id, snippet).
    *
    * Scale shape: ranking, df and first-positions all come from the
    * bucket-pruned index (the corpus is only touched to read the
    * |queries|·k winning texts — the tiny winners frame BROADCASTS into
    * one corpus scan, no shuffle of `docs`); the per-hit term choice is
    * a window over ≤ |vocab| rows per hit. The snippet slice is
    * token-arithmetic only — start/length are clamped identically to
    * the oracle's list slice, so the extract is engine-exact.
    */
  def snippets(spark: SparkSession, name: String,
      queries: Seq[(Int, Seq[String])], docs: DataFrame, idCol: String,
      textCol: String, k: Int = 5, window: Int = 3): DataFrame = {
    val served = bm25Serve(spark, name, queries, k)
      .select(col("qid"), col("rank"), col("id"))
    val terms = queries.flatMap(_._2).distinct
    val post = spark.table(name).drop("ingest_batch")
      .filter(col("term").isin(terms: _*))
      .select(col("id"), col("term"),
        element_at(col("positions"), 1).as("p"))
    val dfreq = post.groupBy("term").agg(count(lit(1)).as("df"))
    import spark.implicits._
    val qdf = queries.flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("qid", "term")
    val pick = Window.partitionBy(col("qid"), col("id"))
      .orderBy(col("df").asc, col("term").asc)
    val best = post
      .join(broadcast(served), Seq("id"))
      .join(broadcast(qdf), Seq("qid", "term"))
      .join(broadcast(dfreq), Seq("term"))
      .withColumn("_rk", row_number().over(pick)).filter(col("_rk") === 1)
      .select(col("qid"), col("rank"), col("id"), col("p"))
    val start1 = greatest(lit(1), col("p") + lit(1 - window))
    val len = col("p") + lit(1 + window) - start1 + lit(1)
    docs.select(col(idCol).as("id"), split(col(textCol), " ").as("t"))
      .join(broadcast(best), Seq("id"))
      .select(col("qid"), col("rank"), col("id"),
        concat_ws(" ", slice(col("t"), start1, len)).as("snippet"))
  }
}
