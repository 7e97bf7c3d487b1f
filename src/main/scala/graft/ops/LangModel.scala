package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextAnalysis.hash48

/** Model-based quality filtering for training-data curation — the two
  * shapes every large corpus pipeline runs after the rule-based filters:
  *
  *  - an N-GRAM LM COVERAGE score against a clean reference corpus (the
  *    CCNet recipe: score every document by how "expected" its n-grams
  *    are under a model of the reference, keep the head of the
  *    distribution). Real CCNet uses KenLM perplexity; log-probability
  *    sums are IEEE-transcendental (ln differs in the last ulp across
  *    libms, so results would not be engine-portable). This engine keeps
  *    the EXACT-INTEGER formulation instead: per-bigram magnitude =
  *    `length(bin(count + 1))` = floor(log2(count + 1)) + 1 — an integer
  *    log2 both engines compute identically — so the doc score is a sum
  *    of integer log-magnitudes: the same "common n-grams score high,
  *    gibberish scores low" ordering, bit-reproducible anywhere.
  *
  *  - a HASHED LINEAR CLASSIFIER (the fastText/DCLM-style learned
  *    filter): tokens hash into `buckets` feature slots, training counts
  *    per (slot, class) over labeled slices, and the per-slot weight is
  *    the exact integer cross-difference c_pos·N_neg − c_neg·N_pos
  *    (positive ⇔ the slot leans positive after normalizing class
  *    sizes — the naive-Bayes decision direction without the float
  *    log-odds). Inference is a narrow fold over a literal weight array.
  */
object LangModel {

  private def toks(textCol: Column): Column = TextAnalysis.tokens(textCol)

  /** Adjacent-token bigrams as "w1 w2" strings; empty for docs with
    * fewer than two tokens (Spark's `sequence(1, 0)` would DESCEND —
    * the guard is load-bearing).
    */
  def bigrams(textCol: Column): Column = {
    val t = toks(textCol)
    when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  /** The reference LM: bigram counts over a clean corpus, capped to the
    * top `vocab` by (count desc, gram asc) — the cap bounds the
    * broadcast at any reference size (TakeOrdered: per-partition
    * partial top-k, k-row driver merge, no global sort). Output:
    * (gram, cnt), meant to be broadcast by [[coverageScore]].
    */
  def bigramLm(ref: DataFrame, textCol: String, vocab: Int): DataFrame = {
    require(vocab > 0, "vocab must be positive")
    ref.select(explode(bigrams(col(textCol))).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram")).limit(vocab)
  }

  /** Score every document's bigrams against the reference LM
    * (broadcast): per doc,
    *
    *  - `n_bigrams`  — total bigrams,
    *  - `oov_bigrams` — bigrams absent from the LM (the gibberish/spam
    *    signal CCNet's tail bucket catches),
    *  - `fluency_num` — Σ length(bin(cnt+1)) over its bigrams (exact
    *    integer log2-magnitudes; OOV contributes length(bin(1)) = 1),
    *  - `fluency_x100` — fluency_num·100 div max(n_bigrams, 1), the
    *    length-normalized score the head/middle/tail cut reads.
    *
    * Shape: one narrow per-doc flatten (the bigram array builds BEFORE
    * the explode, so no per-token row blow-up beyond the bigrams
    * themselves), a BROADCAST left join against the capped LM, then one
    * map-side-combinable re-aggregation per doc — a doc's bigrams stay
    * in its partition, so the exchange carries ~|docs| partial rows.
    */
  def coverageScore(docs: DataFrame, idCol: String, textCol: String,
      lm: DataFrame): DataFrame = {
    val id = col(idCol)
    docs.select(id, explode_outer(bigrams(col(textCol))).as("gram"))
      .join(broadcast(lm), Seq("gram"), "left")
      .groupBy(id)
      .agg(
        count(col("gram")).as("n_bigrams"),
        sum(when(col("gram").isNotNull && col("cnt").isNull, 1L)
          .otherwise(0L)).as("oov_bigrams"),
        sum(when(col("gram").isNotNull,
            length(bin(coalesce(col("cnt"), lit(0L)) + 1)).cast("long"))
          .otherwise(0L)).as("fluency_num"))
      .withColumn("fluency_x100",
        expr("fluency_num * 100 DIV greatest(n_bigrams, 1)"))
  }

  /** CCNet's head/middle/tail cut on the normalized coverage score
    * (fixed integer thresholds — the contract; a production pass derives
    * them once from reference quantiles and then freezes them exactly
    * like this).
    */
  def coverageBucket(fluencyX100: Column, headMin: Long,
      middleMin: Long): Column =
    when(fluencyX100 >= headMin, "head")
      .when(fluencyX100 >= middleMin, "middle")
      .otherwise("tail")

  /** Token → feature slot: portable hash48 mod `buckets`. */
  def featureSlot(token: Column, buckets: Int): Column =
    pmod(hash48(token), lit(buckets.toLong))

  /** Train the hashed linear classifier: per-slot exact integer weight
    * w_j = c_pos_j·N_neg − c_neg_j·N_pos over the labeled slices
    * (`isPos` rows are the positive class, everything else negative),
    * where c_*_j are per-slot token counts and N_* the class token
    * totals — the cross-multiplied frequency difference, positive ⇔
    * the slot is relatively MORE frequent in the positive class. One
    * aggregation into ≤ `buckets` rows (map-side combinable), then a
    * `buckets`-sized driver collect (bounded by construction, like the
    * bloom-filter word list): the weights return as a plain array ready
    * to inline into [[linearScore]]'s narrow fold.
    */
  def trainHashedClassifier(labeled: DataFrame, textCol: String,
      isPos: Column, buckets: Int): Array[Long] = {
    require(buckets > 0 && buckets <= 65536,
      s"buckets must be in (0, 65536], got $buckets")
    val slots = labeled
      .select(isPos.as("pos"), explode(toks(col(textCol))).as("tk"))
      .select(col("pos"), featureSlot(col("tk"), buckets).as("slot"))
      .groupBy(col("slot"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("cn"))
    val rows = slots.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nPos = rows.map(_._2).sum
    val nNeg = rows.map(_._3).sum
    val w = Array.fill(buckets)(0L)
    rows.foreach { case (slot, cp, cn) =>
      w(slot.toInt) = cp * nNeg - cn * nPos
    }
    w
  }

  /** Score documents with trained weights: score_num = Σ w[slot(token)]
    * over the doc's tokens — a NARROW fold with the weight array inlined
    * as literals (buckets ≤ 64k values by the train guard; the same
    * plan-size ceiling discipline as routeToCentroids), zero shuffles,
    * decision = score_num > 0. The magnitude is comparable across docs
    * of similar length; callers wanting a length-normalized margin
    * divide by token count exactly as [[coverageScore]] does.
    */
  def linearScore(docs: DataFrame, idCol: String, textCol: String,
      weights: Array[Long], out: String = "score_num"): DataFrame = {
    val warr = array(weights.map(lit(_)): _*)
    val score = aggregate(toks(col(textCol)), lit(0L),
      (acc, tk) => acc +
        element_at(warr, (pmod(hash48(tk), lit(weights.length.toLong)) + 1)
          .cast("int")))
    docs.withColumn(out, score)
  }
}
