package graft.ops

import org.apache.spark.sql.DataFrame
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
}
