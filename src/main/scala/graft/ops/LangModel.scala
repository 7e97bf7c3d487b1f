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

  /** Per-slot (count_pos, count_neg) over the labeled slices plus class
    * token totals — the shared training aggregation: one map-side
    * combinable groupBy into ≤ `buckets` rows, then a bounded driver
    * collect (the weights are the published artifact). */
  private def slotCounts(labeled: DataFrame, textCol: String,
      isPos: Column, buckets: Int)
      : (Array[(Long, Long, Long)], Long, Long) = {
    val slots = labeled
      .select(isPos.as("pos"), explode(toks(col(textCol))).as("tk"))
      .select(col("pos"), featureSlot(col("tk"), buckets).as("slot"))
      .groupBy(col("slot"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("cn"))
    val rows = slots.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    (rows, rows.map(_._2).sum, rows.map(_._3).sum)
  }

  /** Train the hashed linear classifier: per-slot exact integer weight
    * w_j = c_pos_j·(N_neg/g) − c_neg_j·(N_pos/g) over the labeled
    * slices (`isPos` rows are the positive class, everything else
    * negative), where c_*_j are per-slot token counts, N_* the class
    * token totals and g = gcd(N_pos, N_neg) — the cross-multiplied
    * frequency difference divided by its common factor: same sign, same
    * ordering, positive ⇔ the slot is relatively MORE frequent in the
    * positive class. The gcd normalization plus an explicit magnitude
    * guard make the arithmetic provably exact at corpus scale: every
    * |w_j| ≤ N_pos·N_neg/g is required ≤ 2^43, so [[linearScore]]'s
    * per-document sum stays inside a Long for documents up to 2^20
    * tokens (Spark would WRAP on overflow where DuckDB raises — the
    * silent-desync class this closes; re-bucket the labels or pre-chunk
    * pathological documents if the require fires). The weights return
    * as a plain array ready for [[linearScore]]'s narrow fold.
    */
  def trainHashedClassifier(labeled: DataFrame, textCol: String,
      isPos: Column, buckets: Int): Array[Long] = {
    require(buckets > 0 && buckets <= 65536,
      s"buckets must be in (0, 65536], got $buckets")
    val (rows, nPos, nNeg) = slotCounts(labeled, textCol, isPos, buckets)
    @annotation.tailrec def gcd(a: Long, b: Long): Long =
      if (b == 0L) a else gcd(b, a % b)
    val g = math.max(gcd(nPos, nNeg), 1L)
    val np = nPos / g
    val nn = nNeg / g
    // |w_j| ≤ max(cp·nn, cn·np) ≤ N_pos·N_neg/g = np·N_neg; the check
    // itself is overflow-safe (division form)
    require(np == 0L || nNeg <= (1L << 43) / np,
      s"class token totals too large for exact Long scoring: " +
        s"N_pos·N_neg/gcd = ${np}·$nNeg exceeds 2^43")
    val w = Array.fill(buckets)(0L)
    rows.foreach { case (slot, cp, cn) =>
      w(slot.toInt) = cp * nn - cn * np
    }
    w
  }

  /** RATE-DIFFERENCE weights for multi-class routing: w_j =
    * (c_pos_j·scale) div N_pos − (c_neg_j·scale) div N_neg — each
    * class's slot frequency in fixed-point parts-per-`scale`. The
    * binary classifier's cross-difference weights carry a per-class
    * magnitude (N_pos·N_neg/gcd), fine for a SIGN decision but
    * incomparable ACROSS one-vs-rest models; rate weights put every
    * model on the same ppm scale so [[routeArgmax]]'s argmax is
    * meaningful — still exact integer arithmetic, engine-replayable
    * (non-negative operands, so Spark floor-div and DuckDB trunc-div
    * agree). |w_j| ≤ scale bounds every score by doc_len·scale — no
    * overflow for documents to 2^43/scale tokens. The c·scale products
    * are guarded: at extreme class sizes (N·scale > Long.Max) sample
    * the training slice or lower `scale`.
    */
  def trainRateWeights(labeled: DataFrame, textCol: String, isPos: Column,
      buckets: Int, scale: Long = 1000000L): Array[Long] = {
    require(buckets > 0 && buckets <= 65536,
      s"buckets must be in (0, 65536], got $buckets")
    require(scale > 0 && scale <= 1000000000L,
      s"scale must be in (0, 1e9], got $scale")
    val (rows, nPos, nNeg) = slotCounts(labeled, textCol, isPos, buckets)
    require(nPos <= Long.MaxValue / scale && nNeg <= Long.MaxValue / scale,
      s"class token totals ($nPos/$nNeg) overflow at scale=$scale — " +
        "sample the training slice or lower the scale")
    val w = Array.fill(buckets)(0L)
    rows.foreach { case (slot, cp, cn) =>
      val p = if (nPos > 0) cp * scale / nPos else 0L
      val q = if (nNeg > 0) cn * scale / nNeg else 0L
      w(slot.toInt) = p - q
    }
    w
  }

  /** ALL one-vs-rest rate-weight models in ONE corpus scan: the
    * per-(slot, label) token counts aggregate once (map-side
    * combinable, ≤ buckets·|labels| rows — labels are a bounded
    * vocabulary, same driver-decision class as the weights themselves)
    * and each class's [[trainRateWeights]] arithmetic replays from the
    * collected counts — bit-identical weights (LangModelSpec pins
    * equality), k× fewer corpus scans than k separate trainings: the
    * shape that matters when the labeled slice is 100 TB wide.
    */
  def trainRateWeightsMulti(labeled: DataFrame, textCol: String,
      labelCol: Column, classes: Seq[String], buckets: Int,
      scale: Long = 1000000L): Seq[(String, Array[Long])] = {
    require(classes.nonEmpty && classes.distinct == classes,
      "classes must be non-empty and distinct")
    require(buckets > 0 && buckets <= 65536,
      s"buckets must be in (0, 65536], got $buckets")
    require(scale > 0 && scale <= 1000000000L,
      s"scale must be in (0, 1e9], got $scale")
    val rows = labeled
      .select(labelCol.as("lbl"), explode(toks(col(textCol))).as("tk"))
      .select(col("lbl"), featureSlot(col("tk"), buckets).as("slot"))
      .groupBy(col("slot"), col("lbl"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getString(1), r.getLong(2)))
    val total = rows.map(_._3).sum
    val totalBySlot = Array.fill(buckets)(0L)
    rows.foreach { case (slot, _, c) => totalBySlot(slot) += c }
    classes.map { cls =>
      val cp = Array.fill(buckets)(0L)
      rows.foreach { case (slot, lbl, c) => if (lbl == cls) cp(slot) += c }
      val nPos = cp.sum
      val nNeg = total - nPos
      require(nPos <= Long.MaxValue / scale && nNeg <= Long.MaxValue / scale,
        s"class token totals ($nPos/$nNeg) overflow at scale=$scale")
      val w = Array.tabulate(buckets) { j =>
        val p = if (nPos > 0) cp(j) * scale / nPos else 0L
        val q = if (nNeg > 0) (totalBySlot(j) - cp(j)) * scale / nNeg else 0L
        p - q
      }
      cls -> w
    }
  }

  /** Multi-class routing by argmax over one-vs-rest models (the learned
    * language-ID shape — fastText's flagship use), scored in a SINGLE
    * pass: the token slots (hash48 + pmod) are computed once per
    * document into one array column — not once per model — and ALL
    * model weights travel as ONE matrix (array-of-arrays; plan literal
    * at ≤ `literalMax` total values, else a one-row broadcast relation
    * crossJoined in — ONE BroadcastNestedLoopJoin and O(1) plan size no
    * matter how many classes). Every per-class score then lands in one
    * fold over the slot array whose accumulator is the n-wide score
    * vector (`zip_with` against the weight matrix per token), so a
    * 100-language router costs one tokenization and one fold per row,
    * not 100 of each stacked through 100 joins (the r13 shape). The
    * adds per class happen in the same token order as [[linearScore]]'s
    * single-model fold — Long arithmetic, so the scores are
    * bit-identical to the per-model path (spec-pinned).
    *
    * The winner is the FIRST listed class among the maxima — the same
    * deterministic first-max-wins contract as the marker-based
    * `TextAnalysis.langId`, via one array_max over (score,
    * reversed-index) structs. Train the models with
    * [[trainRateWeights]]/[[trainRateWeightsMulti]] (common scale);
    * zero shuffles beyond the input's own.
    *
    * Adds `out` (the winning class label) and `<out>_score`.
    */
  def routeArgmax(docs: DataFrame, idCol: String, textCol: String,
      models: Seq[(String, Array[Long])], out: String = "lang_pred",
      literalMax: Int = Similarity.RouteLiteralMaxValues): DataFrame = {
    require(models.nonEmpty, "at least one model")
    val n = models.size
    val b = models.head._2.length
    require(models.forall(_._2.length == b),
      "all models must share one bucket space")
    val slots = transform(toks(col(textCol)),
      tk => (pmod(hash48(tk), lit(b.toLong)) + 1).cast("int"))
    def scores(wmat: Column): Column =
      aggregate(col("__slots"), array_repeat(lit(0L), n),
        (acc, s) => zip_with(acc, wmat, (a, w) => a + element_at(w, s)))
    val withScores =
      if (n.toLong * b <= literalMax)
        docs.withColumn("__slots", slots)
          .withColumn("__sarr", scores(
            array(models.map(m => array(m._2.map(lit(_)): _*)): _*)))
      else {
        val spark = docs.sparkSession
        import spark.implicits._
        val wDf = Seq(models.map(_._2.toSeq)).toDF("__wmat")
        docs.withColumn("__slots", slots)
          .crossJoin(broadcast(wDf))
          .withColumn("__sarr", scores(col("__wmat")))
          .drop("__wmat")
      }
    val entries = models.indices.map(i =>
      struct(element_at(col("__sarr"), i + 1).as("s"),
        lit(n - 1 - i).as("ri")))
    val best = array_max(array(entries: _*))
    val codes = lit(models.map(_._1).toArray)
    withScores
      .withColumn(out, element_at(codes, lit(n) - best.getField("ri")))
      .withColumn(s"${out}_score", best.getField("s"))
      .drop("__slots", "__sarr")
  }

  /** Score documents with trained weights: score_num = Σ w[slot(token)]
    * over the doc's tokens — a NARROW fold, zero shuffles, decision =
    * score_num > 0. Weight transport picks itself by slot count exactly
    * like `Similarity.routeToCentroids` (override `literalMax` only in
    * tests): at ≤ [[Similarity.RouteLiteralMaxValues]] slots the array
    * inlines as plan literals; above it the weights ride a ONE-ROW
    * broadcast relation crossJoined in (BroadcastNestedLoopJoin of a
    * single row — row count unchanged, no exchange, O(1) plan size) and
    * the SAME fold reads the array column — identical scores on either
    * path (ScaleSpec pins equality and the big-bucket engagement). The
    * magnitude is comparable across docs of similar length; callers
    * wanting a length-normalized margin divide by token count exactly
    * as [[coverageScore]] does.
    */
  def linearScore(docs: DataFrame, idCol: String, textCol: String,
      weights: Array[Long], out: String = "score_num",
      literalMax: Int = Similarity.RouteLiteralMaxValues): DataFrame = {
    def score(warr: Column): Column =
      aggregate(toks(col(textCol)), lit(0L),
        (acc, tk) => acc +
          element_at(warr, (pmod(hash48(tk), lit(weights.length.toLong)) + 1)
            .cast("int")))
    if (weights.length <= literalMax)
      docs.withColumn(out, score(array(weights.map(lit(_)): _*)))
    else {
      val spark = docs.sparkSession
      import spark.implicits._
      val wDf = Seq(weights.toSeq).toDF("__w")
      docs.crossJoin(broadcast(wDf))
        .withColumn(out, score(col("__w")))
        .drop("__w")
    }
  }
}
