package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import TextAnalysis.hash48

/** Corpus-curation operators for training-data pipelines: deterministic
  * sampling / source mixing, sequence packing (concat-then-chunk), and
  * benchmark decontamination.
  *
  * Everything is deterministic and engine-portable: sampling decisions are
  * md5-derived hash arithmetic (no RNG state, reproducible across runs,
  * cluster sizes and engines — the property that makes a 100 TB pipeline
  * re-runnable), packing is a prefix-sum over a total order, and
  * decontamination rides the shingle inverted index (never n²).
  */
object Curation {

  /** Deterministic per-row sampling decision: keep a row iff
    * `hash48(id) % 10000 < rate * 10000`. One narrow filter — reaches the
    * scan, no shuffle, reproducible (same id → same decision in every
    * run/engine).
    */
  def hashSampled(df: DataFrame, idCol: Column, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(hash48(idCol.cast("string")) % 10000L < math.round(rate * 10000).toInt)
  }

  /** Row-level weighted sampling: keep each row with probability equal to
    * its own `weight10k` (an INTEGER threshold out of 10000 — callers
    * derive it from quality scores with integer arithmetic so the
    * decision is engine-exact). The row-granular generalization of
    * [[mixture]]'s per-source rates: quality-weighted corpus sampling
    * ("better docs survive more often") in one narrow filter, zero
    * shuffles, reproducible per id.
    */
  def weightedSample(df: DataFrame, idCol: Column, weight10k: Column): DataFrame =
    df.filter(hash48(idCol.cast("string")) % 10000L < weight10k)

  /** Weighted mixture across sources: per-source sampling rates (a
    * training-mix recipe, e.g. web 0.6 / code 0.9 / books 1.0). Rows of
    * unlisted sources are dropped. Single scan, no shuffle: the rate
    * lookup is a broadcast-free CASE expression compiled from the map.
    */
  def mixture(df: DataFrame, sourceCol: Column, idCol: Column,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "weights must name at least one source")
    val rate = weights.foldLeft(lit(-1.0)) { case (acc, (src, w)) =>
      when(sourceCol === src, lit(w)).otherwise(acc)
    }
    df.withColumn("_rate", rate)
      .filter(col("_rate") >= 0 &&
        hash48(idCol.cast("string")) % 10000L < (col("_rate") * 10000).cast("long"))
      .drop("_rate")
  }

  /** Deterministic global shuffle: a total order by content hash. The
    * standard pre-training randomization — orderBy is a range-partitioned
    * sort (one exchange), reproducible, and stable under re-runs.
    */
  def globalShuffle(df: DataFrame, idCol: Column): DataFrame =
    df.orderBy(hash48(idCol.cast("string")), idCol)

  /** Deterministic shard assignment for training-data export (the
    * WebDataset/TFRecord-shard shape): shard = hash48(id||salt) mod n,
    * with `ord` (the hash itself) as the reproducible pseudo-random
    * within-shard order. The salt re-keys the whole layout per export
    * epoch without touching the data. hash48 is 48-bit nonnegative, so
    * `mod` agrees across engines with no sign fix-ups. The physical write
    * is `repartition(n, shard).sortWithinPartitions(ord, id)` — one
    * exchange for the entire export; hash assignment balances shard sizes
    * to ±O(sqrt) without a planning pass over the corpus.
    */
  def shardAssign(df: DataFrame, idCol: Column, n: Int,
      salt: String = "shard"): DataFrame =
    df.withColumn("ord", hash48(concat(idCol.cast("string"), lit("_" + salt))))
      .withColumn("shard", col("ord") % n.toLong)

  /** Sequence packing, concat-then-chunk semantics (how pre-training data
    * becomes fixed-length sequences): documents are laid out contiguously
    * in a deterministic order (`orderCol`), and each document is assigned
    * the chunk containing its first token: seq_id = cum_start / seqLen,
    * plus its offset within that chunk and how many chunk boundaries it
    * spans. One window prefix-sum over the total order — a single
    * range-partitioned exchange; at 100 TB the same computation runs
    * per-shard (group the window by a shard column) to avoid one global
    * sort.
    *
    * Output: orderCol, token_count, cum_start, seq_id, seq_offset, n_spans.
    */
  def packSequences(df: DataFrame, orderCol: Column, tokenCountCol: Column,
      seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.orderBy(orderCol)
    df.withColumn("token_count", tokenCountCol.cast("long"))
      .withColumn("cum_start",
        coalesce(sum(col("token_count")).over(w) - col("token_count"), lit(0L)))
      .withColumn("seq_id", (col("cum_start") / seqLen).cast("long"))
      .withColumn("seq_offset", col("cum_start") % seqLen)
      .withColumn("n_spans",
        (((col("cum_start") + col("token_count") - 1) / seqLen).cast("long")
          - col("seq_id") + 1))
  }

  /** Best-fit sequence packing, boundary-respecting semantics (the
    * cross-document-attention-safe alternative to [[packSequences]]'s
    * concat-then-chunk): documents are never split across sequences;
    * within a shard they are placed FIRST-FIT-DECREASING — items sorted
    * (token_count DESC, id ASC), each into the lowest-index bin with
    * enough remaining capacity, a new bin otherwise. A document longer
    * than `seqLen` gets its own bin, flagged `oversize` (the caller
    * truncates or routes it to a longer-context bucket).
    *
    * Scale shape: packing is sharded — `shard = hash48(id) % nShards` —
    * and each shard's items are collected into ONE array handed to the
    * native [[graft.functions.FfdPack]] kernel (codegen'd Catalyst
    * expression: the O(items·bins) first-fit loop as primitive long
    * arithmetic on the executor; an `aggregate`-HOF fold of the same
    * loop measured ~25 µs per interpreted lambda call — 88 s for 5,000
    * docs — where the kernel is sub-millisecond). No UDF, no driver
    * collect. At 100 TB you size `nShards` so a shard is a few thousand
    * documents: per-shard FFD is the standard distributed packing (the
    * global-FFD bin count differs only by the per-shard boundary waste,
    * which the [[packBestFitAudit]] columns quantify), and the whole op
    * is one shuffle on the shard key. Determinism: `array_sort` pins the
    * item order, so results are bit-stable under any partitioning.
    *
    * Output: id, token_count, shard, bin (within-shard 0-based),
    * oversize.
    */
  def packBestFit(df: DataFrame, idCol: Column, tokenCountCol: Column,
      seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(nShards > 0, "nShards must be positive")
    val base = df.select(idCol.cast("long").as("id"),
        tokenCountCol.cast("long").as("cnt"))
      .withColumn("shard",
        TextAnalysis.hash48(col("id").cast("string")) % nShards.toLong)
    base.groupBy(col("shard"))
      .agg(array_sort(collect_list(struct(
        (lit(0L) - col("cnt")).as("nc"), col("id").as("id"),
        col("cnt").as("cnt")))).as("items"))
      .withColumn("asg",
        graft.functions.NativeFfd.ffdPack(col("items"), lit(seqLen.toLong)))
      .select(col("shard"), explode(col("asg")).as("a"))
      .select(col("a.id").as("id"), col("a.cnt").as("token_count"),
        col("shard"), col("a.bin").as("bin"),
        (col("a.cnt") > seqLen.toLong).as("oversize"))
  }

  /** Per-shard packing audit for [[packBestFit]]: bin count, total
    * tokens, and the waste (empty bin capacity) of the best-fit layout
    * vs what concat-then-chunk would leave on the same shard
    * (`seqLen·ceil(total/seqLen) − total`) — the cost of refusing to
    * split documents, published next to the layout. Two combinable
    * aggregations; integer-exact.
    */
  def packBestFitAudit(asg: DataFrame, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    asg.groupBy(col("shard"), col("bin"))
      .agg(sum(col("token_count")).as("fill"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("fill")).as("total_tokens"),
        sum(greatest(lit(0L), lit(seqLen.toLong) - col("fill")))
          .as("waste_bestfit"))
      .withColumn("waste_concat", expr(
        s"(total_tokens + ${seqLen - 1}L) DIV ${seqLen}L * ${seqLen}L" +
          " - total_tokens"))
  }

  /** Fixed-window chunking with overlap (the RAG / context-window prep
    * step): each document's token stream is cut into `window`-token chunks
    * every `stride` tokens (overlap = window - stride), the final chunk
    * clamped at the document end. Pure narrow compute — split, an integer
    * chunk-count formula, one generator explode, a bounded array slice per
    * chunk: ZERO shuffles, so it scales linearly with corpus bytes and
    * pipelines into whatever sink partitioning follows.
    *
    * Output: id, chunk_id, n_chunk_tokens, chunk_text.
    */
  def chunkOverlap(df: DataFrame, idCol: String, textCol: String,
      window: Int = 32, stride: Int = 24): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("t"))
      .withColumn("n_chunks",
        expr(s"1 + (GREATEST(size(t) - $window, 0) + ${stride - 1}) DIV $stride"))
      .select(col("id"), col("t"),
        explode(sequence(lit(0L), col("n_chunks") - lit(1L))).as("ci"))
      .withColumn("ck", slice(col("t"), col("ci") * stride + 1, lit(window)))
      .select(col("id"), col("ci").cast("long").as("chunk_id"),
        size(col("ck")).cast("long").as("n_chunk_tokens"),
        array_join(col("ck"), " ").as("chunk_text"))
  }

  /** Corpus-statistics quality signal: per-document token counts against
    * the corpus document-frequency table — total tokens, tokens whose df
    * is below `minDf` ("rare"; hapax-heavy documents are noise/garble in
    * quality-filtering pipelines), and the rare ratio. The CCNet-style
    * LM-score shape without transcendentals: all-integer arithmetic until
    * one final division, so results hash-match across engines (libm `ln`
    * differs in the last ulp between runtimes — unusable for an exact
    * gate).
    *
    * Two shuffles: the df aggregation (distinct (token, doc) then count)
    * and the per-doc aggregation; the occurrence->df join shuffles on the
    * token key. At 100 TB the df table is Zipf-shaped — AQE's skew join
    * handles the head tokens, or pre-cap with [[Dedup.dfCapped]]-style
    * filtering when only the rare tail matters.
    */
  def rareTokenStats(df: DataFrame, idCol: String, textCol: String,
      minDf: Long): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("t"))
    val docFreq = tok.distinct().groupBy(col("t")).agg(count(lit(1)).as("df"))
    tok.join(docFreq, "t")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("df") < minDf, 1L).otherwise(0L)).as("n_rare"))
      .withColumn("rare_ratio",
        col("n_rare").cast("double") / col("n_tokens"))
  }

  /** Bigram language-model fluency score: each document's bigrams are
    * scored by the corpus-level conditional probability
    * p(v|u) = C(u,v)/C(u·), scaled to `floor(scale·C(u,v)/C(u·))` —
    * integer-exact, no transcendentals — and averaged per document (one
    * final IEEE division). Low scores = locally-implausible token
    * sequences (garbled text, boilerplate soup): the CCNet/KenLM
    * perplexity-filter shape with an engine-portable scoring rule.
    *
    * Scale shape: bigram occurrences are repartitioned ONCE on (u,v),
    * *below* the per-doc (id,u,v) pre-aggregation — because grouping keys
    * can't be pruned, both consumers (the corpus count aggregation and
    * the per-doc join) see an identical exchange subtree, so ReuseExchange
    * materializes it once (a repartition above the aggregation gets
    * pruned differently per branch and re-scans the corpus per consumer).
    * C(u,v) and the join are then co-partitioned, and the join carries
    * per-doc *distinct* bigrams with multiplicity, not raw occurrences.
    * The left-context totals C(u·) derive from the already-aggregated
    * counts (Σ_v C(u,v) = C(u·)) as a window over the vocabulary-sized
    * count table — never a second corpus pass, and no broadcast branch
    * (a separate c1 aggregate joined back defeats AQE stage reuse and
    * re-scans the corpus). Every exchange except the shared one carries
    * vocabulary-sized data. Docs with fewer than 2 tokens carry no
    * bigrams and are absent from the output.
    *
    * Output: id, n_bigrams, sum_scaled, lm_score.
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
      scale: Long = 1000000L): DataFrame = {
    val occ = df.select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("id"), explode(expr(
        "transform(sequence(0, size(t) - 2), " +
          "i -> struct(element_at(t, i + 1) AS u, element_at(t, i + 2) AS v))"))
        .as("b"))
      .select(col("id"), col("b.u").as("u"), col("b.v").as("v"))
      // explicit non-null guard (tokens are never null) so BOTH consumers
      // see the same inferred constraints below the shared exchange — the
      // join branch infers isnotnull(u,v) and the count branch only
      // isnotnull(u); without this the subtrees canonicalize differently
      // and ReuseExchange can't fire.
      .filter(col("u").isNotNull && col("v").isNotNull)
      .repartition(col("u"), col("v"))
    val docBg = occ.groupBy("id", "u", "v").agg(count(lit(1)).as("k"))
    val c2 = docBg.groupBy("u", "v").agg(sum("k").as("c2"))
      .withColumn("c1", sum(col("c2")).over(Window.partitionBy(col("u"))))
    docBg.join(c2, Seq("u", "v"))
      .withColumn("p", expr(s"($scale * c2) DIV c1"))
      .groupBy("id")
      .agg(sum("k").as("n_bigrams"), sum(col("k") * col("p")).as("sum_scaled"))
      .withColumn("lm_score",
        col("sum_scaled").cast("double") / col("n_bigrams"))
  }

  /** Span-level exact dedup (the C4 "line dedup" pass at paragraph
    * granularity): each document is chunked into fixed-width token spans,
    * every span is content-hashed, and any span whose hash already appeared
    * earlier in the corpus order (first occurrence = min (id, span_idx)) is
    * flagged as a duplicate. Removing flagged spans (or docs above a
    * flagged-span ratio) is the standard boilerplate-removal step.
    *
    * One shuffle: the window over span_hash. The explode is narrow, output
    * carries only duplicate spans (tiny vs corpus), and the hash is
    * md5-based — engine-portable and incremental-friendly (new data can be
    * checked against an existing hash index without recompute).
    */
  /** The shared span decomposition: each document's token stream chunked
    * into fixed-width spans, one output row per (id, span_idx, span_text,
    * span_hash). Single source for span boundaries — spanDedup,
    * cleanSpans, and stripBoilerplate must never disagree on where a
    * span starts.
    */
  private[graft] def spanExploded(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int): DataFrame = {
    require(spanTokens > 0, "spanTokens must be positive")
    val toks = TextAnalysis.tokens(col(textCol))
    val nSpans = ceil(size(toks) / lit(spanTokens.toDouble)).cast("int")
    val spans = transform(sequence(lit(0), nSpans - 1),
      i => array_join(slice(toks, i * spanTokens + 1, lit(spanTokens)), " "))
    df.select(col(idCol).as("id"), posexplode(spans).as(Seq("span_idx", "span_text")))
      .select(col("id"), col("span_idx").cast("long").as("span_idx"),
        col("span_text"), md5(col("span_text")).as("span_hash"))
  }

  def spanDedup(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 10): DataFrame = {
    val exploded = spanExploded(df, idCol, textCol, spanTokens)
      .drop("span_text")
    val w = Window.partitionBy(col("span_hash")).orderBy(col("id"), col("span_idx"))
    exploded
      .withColumn("first_id", first(col("id")).over(w))
      .withColumn("first_span", first(col("span_idx")).over(w))
      .filter(col("id") =!= col("first_id") || col("span_idx") =!= col("first_span"))
  }

  /** The cleaning pass over [[spanDedup]]'s detection: drop every span
    * that is a duplicate of an earlier occurrence and rebuild each
    * document's text from its surviving spans (in original order) — the
    * operation C4 applies corpus-wide at line granularity. Documents whose
    * spans were all duplicates disappear. Same single shuffle as
    * spanDedup (the window on span_hash) plus the per-doc rebuild
    * aggregation.
    *
    * Output: (id, clean_text, n_spans, n_kept).
    */
  def cleanSpans(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 10): DataFrame = {
    val exploded = spanExploded(df, idCol, textCol, spanTokens)
    val w = Window.partitionBy(col("span_hash")).orderBy(col("id"), col("span_idx"))
    exploded
      .withColumn("first_id", first(col("id")).over(w))
      .withColumn("first_span", first(col("span_idx")).over(w))
      .withColumn("kept",
        col("id") === col("first_id") && col("span_idx") === col("first_span"))
      .groupBy(col("id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("span_idx"), col("span_text"))))),
          s => s.getField("span_text")), " ").as("clean_text"),
        count(lit(1)).as("n_spans"),
        sum(col("kept").cast("long")).as("n_kept"))
      .filter(col("n_kept") > 0)
  }

  /** Frequency-based boilerplate removal: token spans occurring in at
    * least `minDf` DISTINCT documents are dropped from EVERY document —
    * vs [[cleanSpans]]' first-occurrence-wins. This is the crawl-cleaning
    * rule for content that repeats across pages (navigation chrome,
    * cookie banners, license headers): a span frequent enough to be
    * boilerplate carries no training signal anywhere, including its first
    * occurrence.
    *
    * Scale shape: span df comes from a groupBy(span_hash) COUNTER
    * aggregation joined back on span_hash — deliberately NOT a
    * collect_set window, whose per-group state would be O(df) and explode
    * on exactly the hot boilerplate spans this op exists to remove.
    * Per-doc rebuild is the same single aggregation as cleanSpans.
    *
    * Output: (id, clean_text, n_spans, n_kept); fully-boilerplate docs
    * disappear.
    */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 10, minDf: Int = 2): DataFrame = {
    require(minDf > 1, "minDf must be at least 2")
    // the explicit span_hash repartition lets the distinct-aggregation
    // ride it — HashPartitioning(span_hash) satisfies the (span_hash, id)
    // clustering (subset rule), so the df branch needs NO further
    // exchange. Catalyst prunes that branch's scan to (id, span_hash)
    // only — a deliberate second pass over hash-width columns, far
    // cheaper at corpus scale than forcing both consumers through one
    // wide (span_text-bearing) exchange. Both the pruned shape and the
    // absence of a (span_hash, id)-keyed exchange are pinned in
    // CurationSpec.
    val exploded = spanExploded(df, idCol, textCol, spanTokens)
      .repartition(col("span_hash"))
    val spanDf = exploded.groupBy(col("span_hash"))
      .agg(countDistinct(col("id")).as("span_df"))
    exploded.join(spanDf, "span_hash")
      .withColumn("kept", col("span_df") < minDf)
      .groupBy(col("id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("span_idx"), col("span_text"))))),
          s => s.getField("span_text")), " ").as("clean_text"),
        count(lit(1)).as("n_spans"),
        sum(col("kept").cast("long")).as("n_kept"))
      .filter(col("n_kept") > 0)
  }

  /** Per-document distinctive terms: the k tokens with the lowest corpus
    * document frequency (the TF-IDF "most informative terms" shape with
    * integer-only arithmetic — df ranks replace the log-idf weight, so the
    * result is engine-exact with no transcendentals). Ties break by token
    * text. Two shuffles (df aggregation, per-doc top-k window) — both on
    * keys that scale with vocabulary/doc count, never n².
    */
  def distinctiveTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val tok = df.select(col(idCol).as("id"),
      explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("term"))
    val docFreq = tok.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("id")).orderBy(col("df"), col("term"))
    tok.join(docFreq, "term")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id"), col("term"), col("df"), col("rank"))
  }

  /** Corpus-level adjacent-character pair counts within tokens — the
    * counting step of one BPE merge iteration (vocabulary induction). The
    * per-document generator is fully narrow (pairs are flattened per doc
    * before the explode, so there is no intermediate per-token row
    * blow-up); the only exchange is ONE aggregation over a tiny
    * (≤ |alphabet|²) key space, so map-side partials collapse the corpus
    * to a few thousand rows per task before the shuffle.
    */
  def bpePairCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(expr(
        s"flatten(transform(filter(split($textCol, ' '), tk -> length(tk) >= 2), " +
          "tk -> transform(sequence(1, length(tk) - 1), i -> substring(tk, i, 2))))"))
        .as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))

  /** Rank-based per-source quota: keep at most `n` documents per source,
    * best-first by `rankCol` with a deterministic `idCol` tie-break. The
    * rate-based [[mixture]] hits a target FRACTION; this hits a target
    * COUNT ("at most N docs per domain" — the governance cap that stops a
    * single crawl domain from dominating a mix).
    *
    * Scale shape: a single window per source would funnel each source's
    * entire row set through one task — a straggler when one domain holds
    * billions of rows. Instead rank hierarchically: (1) rows are ranked
    * within (source, salt-bucket) — `buckets`-way parallel, each task
    * emits at most n rows per source — then (2) the surviving ≤ n·buckets
    * rows per source are ranked globally. Both passes use the same total
    * order, so the result is bit-identical to the single-window form while
    * the big shuffle stays salt-spread.
    */
  def sourceQuota(df: DataFrame, sourceCol: Column, idCol: Column,
      rankCol: Column, n: Int, buckets: Int = 32): DataFrame = {
    require(n > 0 && buckets > 0, s"n and buckets must be positive")
    val order: Seq[Column] = Seq(rankCol.desc, idCol.asc)
    val pre = Window.partitionBy(sourceCol,
        pmod(hash48(idCol.cast("string")), lit(buckets.toLong)))
      .orderBy(order: _*)
    val fin = Window.partitionBy(sourceCol).orderBy(order: _*)
    df.withColumn("_rk", row_number().over(pre)).filter(col("_rk") <= n)
      .withColumn("_rk", row_number().over(fin)).filter(col("_rk") <= n)
      .drop("_rk")
  }

  /** Exact-count stratified sample: exactly min(n_s, |stratum|) documents
    * per stratum, chosen uniformly and deterministically — rank by
    * ascending content hash (uniform in hash space, so rank ≤ n is a
    * uniform without-replacement draw), id tie-break. [[mixture]] hits a
    * target FRACTION per source; this hits a target COUNT per stratum
    * (eval-set construction, per-language quotas, balanced fine-tuning
    * mixes). Strata absent from `counts` are dropped.
    *
    * Same hierarchical two-pass window as [[sourceQuota]]: rank within
    * (stratum, salt-bucket) first — each task emits ≤ n rows — then rank
    * the ≤ n·buckets survivors per stratum; bit-identical to the single
    * window, no single-stratum task funnel.
    */
  def stratifiedSample(df: DataFrame, stratumCol: Column, idCol: Column,
      counts: Map[String, Int], buckets: Int = 32): DataFrame = {
    require(counts.nonEmpty, "counts must name at least one stratum")
    require(counts.values.forall(_ > 0), "per-stratum counts must be positive")
    val cap = counts.foldLeft(lit(0)) { case (acc, (s, n)) =>
      when(stratumCol === s, lit(n)).otherwise(acc)
    }
    val order: Seq[Column] = Seq(hash48(idCol.cast("string")).asc, idCol.asc)
    val pre = Window.partitionBy(stratumCol,
        pmod(hash48(idCol.cast("string")), lit(buckets.toLong)))
      .orderBy(order: _*)
    val fin = Window.partitionBy(stratumCol).orderBy(order: _*)
    df.withColumn("_cap", cap).filter(col("_cap") > 0)
      .withColumn("_rk", row_number().over(pre)).filter(col("_rk") <= col("_cap"))
      .withColumn("_rk", row_number().over(fin)).filter(col("_rk") <= col("_cap"))
      .drop("_rk", "_cap")
  }

  /** Systematic probability-proportional-to-size (PPS) sampling, per
    * shard: within each shard the docs are laid out on a weight line in
    * id order (a prefix-sum window), and every `stride = W div k`-th
    * position is a sampling point (offset stride div 2) — a doc is drawn
    * with probability proportional to its weight, heavy docs (weight >
    * stride) drawn with multiplicity `n_points`. The classical
    * token-weighted selection that [[weightedSample]]'s Bernoulli form
    * cannot give an EXACT-k guarantee for.
    *
    * Determinism + portability: pure BIGINT arithmetic (the engine-parity
    * trap is floor-vs-truncate division on negatives — all numerators are
    * kept non-negative by a +stride shift, where truncation ≡ floor).
    * Scale shape: the prefix sum is a window ORDERED WITHIN EACH SHARD —
    * one shuffle on the shard key, no global sort; at 100 TB shards are
    * the natural sampling domains (per-source budgets) and a global
    * systematic pass would need a range exchange instead.
    */
  def ppsSample(df: DataFrame, shardCol: Column, idCol: Column,
      weightCol: Column, k: Long): DataFrame = {
    require(k > 0, "k must be positive")
    val byShard = Window.partitionBy(shardCol)
    val run = byShard.orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def floorDivNN(a: Column, b: Column): Column = // non-negative domain
      floor(a.cast("decimal(38,0)").divide(b.cast("decimal(19,0)")))
        .cast("bigint")
    df.withColumn("__w", weightCol.cast("bigint"))
      .withColumn("__c", sum(col("__w")).over(run))
      .withColumn("__total", sum(col("__w")).over(byShard))
      .withColumn("__stride",
        greatest(floorDivNN(col("__total"), lit(k)), lit(1L)))
      .withColumn("__off", floorDivNN(col("__stride"), lit(2L)))
      // points at positions off+1+j*stride; doc covers (__c-__w, __c];
      // +stride keeps both numerators >= 0 and cancels in the difference
      .withColumn("n_points",
        floorDivNN(col("__c") - col("__off") - 1 + col("__stride"),
          col("__stride")) -
        floorDivNN(col("__c") - col("__w") - col("__off") - 1 + col("__stride"),
          col("__stride")))
      .filter(col("n_points") >= 1L)
      .drop("__w", "__c", "__total", "__stride", "__off")
  }

  /** GLOBAL systematic PPS sampling — [[ppsSample]] without the shard
    * crutch, shaped for 100 TB: a global prefix sum CANNOT be one window
    * (that is a single-partition sort — the classic scale-killer), so it
    * is the classic two-phase distributed prefix sum instead:
    *
    *  1. range-exchange + in-partition sort on the id (a sampled
    *     RangePartitioning, no global sort buffer);
    *  2. per-partition weight totals to the driver (O(partitions) longs —
    *     the same driver-decision scale as the MV bucket lists) →
    *     cumulative offsets broadcast back;
    *  3. within-partition prefix sum + the partition's offset = the
    *     global running position, exact.
    *
    * Output is deterministic despite the sampled partition BOUNDARIES:
    * each row's global prefix depends only on the total id order, not on
    * where the cuts fell, so the same rows are drawn on any cluster
    * layout (and the DuckDB oracle replays it as one ordered window).
    */
  def ppsSampleGlobal(df: DataFrame, idCol: Column, weightCol: Column,
      k: Long, partitions: Int = 0): DataFrame = {
    require(k > 0, "k must be positive")
    val base0 = df.withColumn("__w", weightCol.cast("bigint"))
    // localCheckpoint (eager): phase-2's totals and phase-3's prefix must
    // see the SAME partition cuts — the range exchange samples, and a
    // recomputation could re-cut; the checkpoint pins the layout (and a
    // lost block fails loudly instead of silently re-sampling)
    val base = (if (partitions > 0) base0.repartitionByRange(partitions, idCol)
                else base0.repartitionByRange(idCol))
      .sortWithinPartitions(idCol)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val partSums = base.groupBy(col("__pid")).agg(sum(col("__w")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = partSums.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)((acc, p) => acc + partSums(p)))
      .toMap
    val total = partSums.values.sum
    val stride = math.max(total / k, 1L)
    val off = stride / 2
    // The per-partition offsets go back as a BROADCAST JOIN on __pid —
    // O(1) plan depth and an O(1) hash probe per row. (A foldLeft of
    // `when(__pid === p, …)` literals would build a CaseWhen tree whose
    // DEPTH equals the partition count: at 100 TB range-exchange counts,
    // 10^4–10^5 partitions, that is expression-tree depth the planner
    // either refuses to codegen or stack-overflows on. A typedLit(Map)
    // + element_at has the same O(partitions) hazard per ROW: literal
    // MapData lookup is a linear scan.)
    val spark = df.sparkSession
    val offDf = spark.createDataset(pids.map(p => (p, offsets(p))))(
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.Encoders.scalaLong))
      .toDF("__pid", "__poff")
    val run = Window.partitionBy(col("__pid")).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def floorDivNN(a: Column, b: Column): Column =
      floor(a.cast("decimal(38,0)").divide(b.cast("decimal(19,0)")))
        .cast("bigint")
    base
      .join(broadcast(offDf), "__pid")
      .withColumn("__c", sum(col("__w")).over(run) + col("__poff"))
      .withColumn("n_points",
        floorDivNN(col("__c") - lit(off) - 1 + lit(stride), lit(stride)) -
        floorDivNN(col("__c") - col("__w") - lit(off) - 1 + lit(stride),
          lit(stride)))
      .filter(col("n_points") >= 1L)
      .drop("__w", "__pid", "__c", "__poff")
  }

  /** Epoch replication: repeat each source's documents `epochs(source)`
    * times (default 1), tagging each copy with its epoch ordinal — the
    * "high-quality sources get N epochs" half of a training-mix recipe
    * (the other half, rate-downsampling, is [[mixture]]). A narrow
    * generator (explode of a per-row sequence): zero shuffles, output
    * scales with the replicated row count and nothing else. Downstream,
    * [[globalShuffle]] on (id, epoch) interleaves the copies
    * deterministically.
    */
  def replicate(df: DataFrame, sourceCol: Column, epochs: Map[String, Int]): DataFrame = {
    require(epochs.values.forall(_ >= 1), "epoch counts must be >= 1")
    val n = epochs.foldLeft(lit(1)) { case (acc, (s, e)) =>
      when(sourceCol === s, lit(e)).otherwise(acc)
    }
    df.withColumn("epoch", explode(sequence(lit(1L), n.cast("long"))))
  }

  /** Benchmark decontamination: training docs sharing at least `minShared`
    * distinct word n-gram shingles with ANY eval doc. Rides the shingle
    * inverted index — the eval side is tiny (a benchmark), so its shingle
    * set broadcasts and the check is a semi-join-shaped aggregation, never
    * a train×eval cross product. Returns (id, shared_shingles) for flagged
    * training docs; `train.join(result, Seq("id"), "left_anti")` is the
    * cleaned corpus.
    */
  def contaminated(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3, minShared: Int = 2): DataFrame = {
    val trainSh = Dedup.shingles(train, idCol, textCol, n)
    val evalSh = Dedup.shingles(eval, idCol, textCol, n)
      .select(col("shingle")).distinct()
    trainSh.join(broadcast(evalSh), Seq("shingle"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("shared_shingles"))
      .filter(col("shared_shingles") >= minShared)
  }

  /** The eval-set Bloom filter for [[bloomDecontaminate]]: an m-bit
    * bitmap (m/64 longs) over the eval set's shingles, k md5-derived
    * hash positions per shingle. Built DISTRIBUTED — positions explode
    * narrow, `bit_or` folds each 64-bit word map-side — and only the
    * finished ~m/8-byte bitmap is collected (8 KiB at m=2^16): the one
    * driver touch is the artifact itself, never the data.
    */
  def evalShingleBloom(eval: DataFrame, idCol: String, textCol: String,
      m: Int, k: Int, n: Int = 3): Array[Long] = {
    require(m % 64 == 0 && Integer.bitCount(m) == 1, s"m must be a 2^j: $m")
    val positions = Dedup.shingles(eval, idCol, textCol, n)
      .select(explode(array((0 until k).map(j =>
        pmod(TextAnalysis.hash48(concat(lit(s"$j~"), col("shingle"))),
          lit(m.toLong))): _*)).as("pos"))
    val words = new Array[Long](m / 64)
    positions
      .groupBy((col("pos") / 64).cast("int").as("w"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        pmod(col("pos"), lit(64L)).cast("int"))).as("bits"))
      .collect().foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** `true` iff every one of `shingle`'s k bloom positions is set — a
    * pure codegen'd expression over the broadcast bitmap literal; no
    * join, no shuffle, no UDF.
    */
  def bloomMightContain(shingle: Column, words: Array[Long],
      k: Int): Column = {
    val m = words.length * 64L
    val bitmap = lit(words)
    (0 until k).map { j =>
      val pos = pmod(TextAnalysis.hash48(concat(lit(s"$j~"), shingle)),
        lit(m))
      (element_at(bitmap, (pos / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pmod(pos, lit(64L)).cast("int")))) =!= 0L
    }.reduce(_ && _)
  }

  /** Decontamination at corpus scale: [[contaminated]]'s exact
    * shingle-overlap semantics, reached through a BLOOM prefilter so the
    * eval set never joins against the full corpus. The bitmap (8 KiB at
    * m=2^16) rides the plan as a literal into every task — the
    * membership test is a scalar filter at the scan, so only
    * possibly-contaminated shingles ever reach the verify join, whose
    * broadcast side is the true eval shingle set (Bloom false positives
    * die there; false negatives cannot exist — a set bit is never
    * missed). Output ≡ [[contaminated]] exactly — the l89 gate
    * hash-checks the Bloom path against the plain-join oracle.
    */
  def bloomDecontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, m: Int = 1 << 16, k: Int = 3, n: Int = 3,
      minShared: Int = 2): DataFrame = {
    val words = evalShingleBloom(eval, idCol, textCol, m, k, n)
    val candidates = Dedup.shingles(train, idCol, textCol, n)
      .filter(bloomMightContain(col("shingle"), words, k))
    val evalSh = Dedup.shingles(eval, idCol, textCol, n)
      .select(col("shingle")).distinct()
    candidates.join(broadcast(evalSh), Seq("shingle"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("shared_shingles"))
      .filter(col("shared_shingles") >= minShared)
  }

  /** Materialize a [[tokenBudget]] plan: emit each source's rows for
    * `epochs - 1` full passes plus one PARTIAL pass sampled
    * deterministically (hash48(id) against the residual rate in basis
    * points) so the achieved token count tracks the target in
    * expectation (the residual is rate-sampled, so it carries sampling
    * variance — the audit reports the realized deviation).
    * Undersubscribed sources (target < avail)
    * get epochs = 1, i.e. the partial pass IS the sample; sources with a
    * zero target emit nothing. One broadcast of the |sources|-row plan +
    * a narrow generator — the epoch fan-out is exactly the intended
    * replication, nothing shuffles.
    */
  def enforceBudget(df: DataFrame, sourceCol: Column, idCol: Column,
      tokenCountCol: Column, weights: Map[String, Int],
      budget: Long): DataFrame = {
    val plan = tokenBudget(df, sourceCol, tokenCountCol, weights, budget)
      .filter(col("target_tokens") > 0)
      .withColumn("partial_bp", expr(
        "(target_tokens - (epochs - 1) * avail_tokens) * 10000 DIV avail_tokens"))
    df.select(sourceCol.as("source"), idCol.as("id"),
        tokenCountCol.cast("long").as("n_tokens"))
      .join(broadcast(plan.select(col("source"), col("epochs"),
        col("partial_bp"))), "source")
      .withColumn("epoch", explode(sequence(lit(1L), col("epochs"))))
      .filter(col("epoch") < col("epochs") ||
        hash48(col("id").cast("string")) % 10000L < col("partial_bp"))
      .select(col("id"), col("source"), col("epoch"), col("n_tokens"))
  }

  /** Character symbolization for BPE: the word as space-joined chars plus
    * an end-of-word marker (Sennrich's convention — word-final merges stay
    * distinct from word-internal ones).
    */
  private def bpeSymExpr(wordCol: String): String =
    s"""CASE WHEN length($wordCol) = 0 THEN '</w>'
      ELSE concat(array_join(transform(sequence(1, length($wordCol)),
        i -> substring($wordCol, i, 1)), ' '), ' </w>') END"""

  /** One BPE merge applied to a symbol string (leftmost-first,
    * non-overlapping — the BPE convention): a left fold over the symbols
    * that replaces an (m_left, m_right) adjacency with the merged symbol.
    * A fold (not a string replace) because replace() cannot guard BOTH
    * symbol boundaries across back-to-back occurrences sharing a
    * delimiter. `m_left`/`m_right` are row columns (broadcast from the
    * argmax frame), so corpus text never round-trips through SQL literals.
    */
  private val bpeMergeExpr: String =
    """aggregate(
      slice(split(syms, ' '), 2, size(split(syms, ' ')) - 1),
      element_at(split(syms, ' '), 1),
      (acc, s) -> CASE WHEN s = m_right AND (acc = m_left OR
          right(acc, length(m_left) + 1) = concat(' ', m_left))
        THEN CASE WHEN acc = m_left THEN concat(m_left, m_right)
          ELSE concat(left(acc, length(acc) - length(m_left) - 1),
            ' ', m_left, m_right) END
        ELSE concat(acc, ' ', s) END)"""

  /** BPE tokenizer TRAINING (the distributed form of the standard
    * algorithm): count adjacent symbol pairs over the word-FREQUENCY
    * table (vocabulary-sized, never the corpus), pick the most frequent
    * pair (ties: count DESC, then pair ASC — deterministic), and apply
    * it to every word's symbol sequence, `merges` times.
    *
    * BATCHED iterations (the 100 TB dial a serial one-job-per-merge loop
    * lacks — a 32k vocab must not cost 32k driver round trips): each
    * round collects the top pairs once and admits the maximal PREFIX of
    * the sorted pair list (≤ `maxBatch`) that is provably serial-exact,
    * then applies the whole batch in ONE Spark job. The admission proof:
    *  - prefix + pairwise symbol-disjoint — disjoint merges commute, and
    *    every pair outranking an admitted p_k is itself admitted (a
    *    strictly-higher count sorts strictly earlier), so no shadowed
    *    overlapping candidate can serially outrank p_k;
    *  - new pairs created by an admitted (a,b)→ab are (x,ab) / (ab,y)
    *    with counts bounded by the OLD counts of (x,a) / (b,y) — pairs
    *    sharing a symbol with (a,b). Any such pair with count
    *    > count(p_k) would sit in the (disjoint) prefix: contradiction.
    *    Count TIES with p_k are rejected explicitly (the collected head
    *    is certified complete down to count(p_k) first), because a tied
    *    new pair could win the (left, right) ASC tie-break;
    *  - a left==right merge ("x x"→"xx") closes its batch: its new
    *    pairs ((xx,x) in an odd run) are bounded by its OWN count, which
    *    the disjointness argument cannot certify against later admits.
    * Rounds where the corpus admits only the top pair degrade to the
    * serial algorithm — the batch is an optimization with an exactness
    * proof, never an approximation (l103's oracle gates the learned
    * table bit-for-bit).
    *
    * Scale shape: the corpus is scanned ONCE (token explode into a
    * combinable word count); every round then touches only the word
    * table — pair counts are a map-side-combinable aggregation, the
    * candidate head is `orderBy(...).limit(K)` (TakeOrderedAndProject:
    * per-partition top-K), and the batch application is R chained narrow
    * maps riding one localCheckpoint job (the iterative-algorithm
    * lineage pattern, vocabulary-sized, data stays on executors). The
    * per-round `collect()` moves ≤ K (left, right, count) rows to the
    * driver — the merge DECISION, same documented class as the engine's
    * other ≤N-row driver decisions.
    *
    * Returns (merge table: step/m_left/m_right/merged/pair_n — the
    * artifact a tokenizer build publishes, LocalRelation-backed;
    * final word table: word/cnt/syms — for segmentation).
    */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int,
      maxBatch: Int = 8): (DataFrame, DataFrame) = {
    require(merges > 0, "at least one merge")
    require(maxBatch > 0, "maxBatch must be positive")
    val spark = df.sparkSession
    import org.apache.spark.sql.Encoders
    var words = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms", expr(bpeSymExpr("word")))
      .localCheckpoint(true)
    val learned = Seq.newBuilder[(Long, String, String, String, Long)]
    // Every multi-character symbol the word table can contain: '</w>'
    // from tokenization plus the output of each learned merge. Needed by
    // the admission proof's symbol-collision guard — an admitted merge
    // whose OUTPUT string equals a pre-existing symbol (e.g. 'xyz'
    // created earlier via ('x','yz'), now ('xy','z') admitted) INCREASES
    // that symbol's occurrence count, so pairs adjacent to it can grow
    // past count(p_k) and a later admit could diverge from the serial
    // algorithm despite disjointness/tie checks. Such an admit closes
    // its batch (the serial algorithm then recounts — exactness holds).
    val liveSyms = scala.collection.mutable.Set("</w>")
    var k = 0
    while (k < merges) {
      val want = math.min(maxBatch, merges - k)
      // head size: enough slack that equal-count runs around the batch
      // stay inside the collected window (the admission rule refuses any
      // candidate the window cannot certify, so a short window costs
      // batch width, never correctness)
      val headN = math.max(2, 4 * want)
      val head = words
        .select(col("cnt"), split(col("syms"), " ").as("l"))
        .select(col("cnt"), expr(
          """explode(CASE WHEN size(l) < 2 THEN array()
            ELSE transform(sequence(1, size(l) - 1),
              i -> named_struct(
                'a', element_at(l, CAST(i AS INT)),
                'b', element_at(l, CAST(i AS INT) + 1))) END)""").as("p"))
        .groupBy(col("p.a").as("m_left"), col("p.b").as("m_right"))
        .agg(sum(col("cnt")).as("pair_n"))
        .orderBy(col("pair_n").desc, col("m_left"), col("m_right"))
        .limit(headN).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      require(head.nonEmpty, s"corpus exhausted before merge ${k + 1}")
      // complete = the window holds EVERY pair with count ≥ n (needed to
      // certify tie-safety for a candidate of count n)
      val sawAll = head.length < headN
      def completeDownTo(n: Long): Boolean = sawAll || n > head.last._3
      val admitted = scala.collection.mutable.ArrayBuffer(head.head)
      val used = scala.collection.mutable.Set(head.head._1, head.head._2)
      var open = head.head._1 != head.head._2 // self-merge closes the batch
      // symbol-collision guard (see liveSyms above): track the admit's
      // output as a used symbol so no later same-batch candidate can
      // reference it with a stale count, and close the batch when the
      // output re-creates a pre-existing symbol (unknown pairs adjacent
      // to it may grow beyond any certification the window can give)
      def admitOutput(a: String, b: String): Unit = {
        val merged = a + b
        used += merged
        if (liveSyms(merged)) open = false
        liveSyms += merged
      }
      admitOutput(head.head._1, head.head._2)
      var i = 1
      while (open && admitted.size < want && i < head.length) {
        val (a, b, n) = head(i)
        val disjoint = !used(a) && !used(b)
        // equal-count ADMITTED pairs are disjoint by construction and no
        // threat; the check targets non-admitted count ties that overlap
        // an admitted merge (their spawned pairs could tie-break-win)
        val tieSafe = completeDownTo(n) && head.forall { case q@(qa, qb, qn) =>
          qn != n || admitted.contains(q) || (!used(qa) && !used(qb))
        }
        if (disjoint && tieSafe) {
          admitted += head(i); used += a; used += b
          admitOutput(a, b)
          if (a == b) open = false
        } else open = false
        i += 1
      }
      admitted.foreach { case (ma, mb, n) =>
        k += 1
        learned += ((k.toLong, ma, mb, ma + mb, n))
      }
      // the whole batch rides ONE eager checkpoint job: R chained folds,
      // each keyed off its own broadcast single-row frame
      var w = words
      admitted.foreach { case (ma, mb, _) =>
        val bestDf = spark.createDataset(Seq((ma, mb)))(
          Encoders.tuple(Encoders.STRING, Encoders.STRING))
          .toDF("m_left", "m_right")
        w = w.crossJoin(broadcast(bestDf))
          .withColumn("syms", expr(bpeMergeExpr))
          .drop("m_left", "m_right")
      }
      words = w.localCheckpoint(true)
    }
    val mergeTable = spark.createDataset(learned.result())(
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.STRING,
        Encoders.STRING, Encoders.scalaLong))
      .toDF("step", "m_left", "m_right", "merged", "pair_n")
    (mergeTable, words)
  }

  /** Segment the corpus under a trained BPE vocabulary: per document, the
    * whitespace token count and the subword count after the learned
    * merges — the compression audit a tokenizer build publishes. The
    * merge work happened per unique WORD in [[bpeTrain]]; here the
    * corpus just joins the vocabulary-sized word table (broadcast-able
    * at any corpus scale — the word table grows sublinearly).
    */
  def bpeSegmentCounts(df: DataFrame, idCol: String, textCol: String,
      finalWords: DataFrame): DataFrame =
    df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .join(finalWords.select(col("word"),
        size(split(col("syms"), " ")).cast("long").as("n_sub")), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_sub")).as("n_subwords"))
      .orderBy(col(idCol))

  /** BPE ENCODE — apply a TRAINED merge table to the corpus and emit the
    * per-document TOKEN-ID SEQUENCE: the actual tokenization pass a
    * training-data pipeline runs between curation and sequence packing
    * ([[bpeTrain]] learns the table, [[bpeSegmentCounts]] audits
    * compression; this produces the ids a trainer consumes).
    *
    * Algorithm: the corpus' UNIQUE words are symbolized exactly as in
    * training and every merge is applied in learned step order by the
    * SAME leftmost-first fold ([[bpeMergeExpr]]) — so words unseen at
    * training time still encode correctly (the fold applies whatever
    * merges their characters admit, the defining property of BPE
    * inference). Vocabulary ids are then assigned over the encoded
    * corpus' realized symbol set, `(sym ASC)` row-number — a
    * deterministic, engine-replayable contract — or, when
    * `frozenVocab` is given (the deployed-tokenizer path, see
    * [[bpeVocab]]), looked up in the TRAINING-time vocab with stray
    * symbols mapping to [[UnkId]]: tokenize-at-ingest encodes every
    * batch under the same id space the trainer published.
    *
    * Scale shape: ALL merge work happens on the unique-WORD table
    * (vocabulary-sized — grows sublinearly in corpus bytes), as R
    * chained narrow maps with a `localCheckpoint` every
    * `checkpointEvery` steps bounding plan depth (the iterative-lineage
    * pattern [[bpeTrain]] uses); the merge table itself is a ≤R-row
    * driver collect (the published artifact — same documented class as
    * the engine's other bounded driver decisions). The corpus is
    * touched exactly twice: one posexplode + word-table join (broadcast
    * candidate at any corpus size) and one per-document re-aggregation
    * whose collect_list is array_sort'ed for a deterministic token
    * order — so the whole encode costs one exchange more than a word
    * count, independent of merge count.
    *
    * Returns (encoded: idCol, n_tokens, n_ids, ids — ids `array<long>`
    * in document token order; vocab: sym, tid).
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      mergeTable: DataFrame, checkpointEvery: Int = 8,
      frozenVocab: Option[DataFrame] = None,
      byteFallback: Boolean = false): (DataFrame, DataFrame) = {
    require(checkpointEvery > 0, "checkpointEvery must be positive")
    require(!byteFallback || frozenVocab.isDefined,
      "byteFallback needs a frozen vocab (the unconstrained path realizes " +
        "every symbol, so nothing is ever out-of-vocabulary)")
    val spark = df.sparkSession
    import org.apache.spark.sql.Encoders
    val merges = mergeTable
      .select(col("step").cast("long"), col("m_left"), col("m_right"))
      .orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2)))
    var words = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .distinct()
      .withColumn("syms", expr(bpeSymExpr("word")))
    merges.grouped(checkpointEvery).foreach { batch =>
      var w = words
      batch.foreach { case (ma, mb) =>
        val mDf = spark.createDataset(Seq((ma, mb)))(
          Encoders.tuple(Encoders.STRING, Encoders.STRING))
          .toDF("m_left", "m_right")
        w = w.crossJoin(broadcast(mDf))
          .withColumn("syms", expr(bpeMergeExpr))
          .drop("m_left", "m_right")
      }
      words = w.localCheckpoint(true)
    }
    // ids come from the FROZEN vocab when given (the deployed-tokenizer
    // contract: symbols outside it map to UnkId — see [[bpeVocab]]);
    // otherwise from the realized symbol set (the window is over the
    // VOCAB, bounded by construction like vocabCoverage's top-maxV,
    // never the corpus)
    val vocab = frozenVocab.getOrElse(words
      .select(explode(split(col("syms"), " ")).as("sym"))
      .distinct()
      .withColumn("tid",
        row_number().over(Window.orderBy(col("sym"))).cast("long")))
    // per-(pos, sym) id LIST: in-vocab symbols are a 1-element list;
    // under byteFallback a stray symbol decomposes to its UTF-8 bytes,
    // each as a reserved id `byteBase + byteValue` ABOVE the frozen vocab
    // (GPT-2 byte-level / SentencePiece byte_fallback semantics — every
    // string encodes losslessly, see [[bpeDecode]]); otherwise a stray
    // collapses to the single [[UnkId]]
    val symIds: Column =
      if (byteFallback) {
        // bounded driver decision: one max over the vocab-sized frozen
        // artifact pins the reserved byte-id range (published with it)
        val byteBase = frozenVocab.get.agg(max(col("tid"))).head()
          .getLong(0) + 1L
        when(col("tid").isNotNull, array(col("tid")))
          .otherwise(byteFallbackIds(col("sym"), byteBase))
      } else array(coalesce(col("tid"), lit(UnkId)))
    val wordIds = words
      .select(col("word"),
        posexplode(split(col("syms"), " ")).as(Seq("pos", "sym")))
      .join(broadcast(vocab), Seq("sym"), "left")
      .withColumn("sids", symIds)
      .groupBy(col("word"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("sids")))),
        x => x.getField("sids"))).as("wids"))
    val encoded = df
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("tpos", "word")))
      .join(wordIds, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        flatten(transform(
          array_sort(collect_list(struct(col("tpos"), col("wids")))),
          x => x.getField("wids"))).as("ids"))
      .withColumn("n_ids", size(col("ids")).cast("long"))
    (encoded, vocab)
  }

  /** The out-of-vocabulary token id under a FROZEN vocab (ids are
    * 1-based row numbers, so 0 is free by construction). */
  val UnkId: Long = 0L

  /** Freeze the tokenizer's PUBLISHED vocab from the training corpus:
    * the realized symbol set of the trained word table ([[bpeTrain]]'s
    * second return) with sym-ASC row-number ids — exactly what
    * [[bpeEncode]] derives when unconstrained, materialized as a
    * LocalRelation (vocabulary-sized collect: broadcastable,
    * lineage-free, the artifact a deployment ships next to the merge
    * table). Feed it back as `frozenVocab` to encode LATER arrivals —
    * batch or streaming — under the training-time id space, strays
    * mapping to [[UnkId]].
    */
  def bpeVocab(trainedWords: DataFrame): DataFrame = {
    val spark = trainedWords.sparkSession
    val rows = trainedWords
      .select(explode(split(col("syms"), " ")).as("sym"))
      .distinct()
      .withColumn("tid",
        row_number().over(Window.orderBy(col("sym"))).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    spark.createDataset(rows)(org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.scalaLong)).toDF("sym", "tid")
  }

  /** A stray symbol's byte-fallback id list: the symbol's UTF-8 bytes,
    * each mapped to the reserved id `byteBase + byteValue` (a 256-id
    * block published alongside the frozen vocab). Pure codegen'd
    * expression — hex + a bounded transform over the byte count; no UDF.
    */
  private def byteFallbackIds(sym: Column, byteBase: Long): Column = {
    val hx = hex(encode(sym, "UTF-8"))
    transform(sequence(lit(1), (length(hx) / 2).cast("int")),
      i => lit(byteBase)
        + conv(hx.substr((i - lit(1)) * 2 + 1, lit(2)), 16, 10).cast("long"))
  }

  /** BPE DECODE — invert [[bpeEncode]]'s frozen-vocab byte-fallback
    * encoding back to (whitespace-normalized) text, proving the encode is
    * LOSSLESS: in-vocab ids look up their symbol's UTF-8 hex, byte ids
    * (`tid >= byteBase`) contribute their single byte, the per-document
    * hex concatenates in token order, decodes as UTF-8, and the `</w>`
    * end-of-word markers become spaces. Byte fallback makes the hex
    * detour necessary AND sufficient: a multi-byte code point split
    * across consecutive byte ids only reassembles correctly at the byte
    * level, never by per-id string concat.
    *
    * Scale shape: one posexplode + broadcast vocab join + one per-doc
    * re-aggregation — the same two-touch shape as the encode; no
    * driver-side text, no UDFs.
    *
    * Input must carry (idCol, ids: array<long>); returns (idCol, text).
    */
  def bpeDecode(encoded: DataFrame, idCol: String, vocab: DataFrame,
      byteBase: Long): DataFrame = {
    val hexDigits = "0123456789ABCDEF"
    encoded
      .select(col(idCol), posexplode(col("ids")).as(Seq("pos", "tid")))
      .join(broadcast(vocab), Seq("tid"), "left")
      .withColumn("h",
        when(col("tid") < byteBase, hex(encode(col("sym"), "UTF-8")))
          .otherwise(concat(
            lit(hexDigits).substr(
              (((col("tid") - byteBase) / 16).cast("int") + 1).cast("int"),
              lit(1)),
            lit(hexDigits).substr(
              (((col("tid") - byteBase) % 16).cast("int") + 1).cast("int"),
              lit(1)))))
      .groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("h")))),
        x => x.getField("h")), "").as("hx"))
      .withColumn("text",
        rtrim(replace(decode(unhex(col("hx")), "UTF-8"), lit("</w>"), lit(" "))))
      .drop("hx")
  }

  /** Vocabulary coverage curve (tokenizer vocab sizing): for each candidate
    * vocab size V, how many corpus tokens the top-V most frequent token
    * types cover. Rank order is (count DESC, token ASC) — fully
    * deterministic, so the curve is engine-exact integer arithmetic.
    *
    * Scale shape: one explode + map-side-combinable type count, then
    * `orderBy(...).limit(maxV)` — Spark plans that as
    * TakeOrderedAndProject (per-partition top-k merged at the driver),
    * NOT a global sort and NOT a single-partition window over the full
    * type table (which is tens of millions of rows at 100 TB). Only the
    * ≤ maxV surviving rows see a window, and maxV is a few thousand by
    * construction (it is the tokenizer vocab being sized).
    */
  def vocabCoverage(df: DataFrame, textCol: String,
      sizes: Seq[Int]): DataFrame = {
    require(sizes.nonEmpty, "at least one candidate vocab size")
    val maxV = sizes.max
    val toks = df.select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(maxV)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cnt").desc, col("tok"))))
    val total = toks.agg(count(lit(1)).as("total_tokens"))
    // a LocalRelation (not an RDD parallelize) so the plan stays
    // driver-literal — LocalTableScan, broadcastable, no lineage
    val szDf = df.sparkSession
      .createDataset(sizes.map(_.toLong))(
        org.apache.spark.sql.Encoders.scalaLong)
      .toDF("vocab_size")
    // inequality join over ≤ |sizes| × maxV rows — both sides tiny
    broadcast(szDf).join(top, col("rk") <= col("vocab_size"))
      .groupBy(col("vocab_size"))
      .agg(count(lit(1)).as("n_types"), sum(col("cnt")).as("covered_tokens"))
      .crossJoin(broadcast(total))
      .orderBy(col("vocab_size"))
  }

  /** Token-budget mixture solver (the pretraining-mix planning step):
    * given integer target weights per source and a global token budget,
    * derive per source the available tokens, the target token share
    * `budget * w / Σw`, the number of epochs needed when the share
    * oversubscribes the source (`ceil(target / avail)` — data repeats),
    * and the sampling rate in basis points (> 10000 means repeat). All
    * BIGINT arithmetic — the plan is engine-exact and auditable.
    *
    * Scale shape: one map-side-combinable per-source aggregation over the
    * corpus; the weight lookup is a compiled CASE (no join); the output is
    * |sources| rows.
    */
  def tokenBudget(df: DataFrame, sourceCol: Column, tokenCountCol: Column,
      weights: Map[String, Int], budget: Long): DataFrame = {
    require(weights.nonEmpty && weights.valuesIterator.forall(_ > 0),
      "weights must be positive")
    require(budget > 0, "budget must be positive")
    val wsum = weights.valuesIterator.map(_.toLong).sum
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (src, wt)) => when(sourceCol === src, lit(wt.toLong))
        .otherwise(acc)
    }
    df.select(sourceCol.as("source"), tokenCountCol.cast("long").as("_tc"))
      .withColumn("_w", w).filter(col("_w") > 0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_tc")).as("avail_tokens"),
        first(col("_w")).as("_w"))
      .withColumn("target_tokens",
        expr(s"CAST($budget AS BIGINT) * _w DIV ${wsum}"))
      .withColumn("epochs",
        expr("(target_tokens + avail_tokens - 1) DIV avail_tokens"))
      .withColumn("rate_bp",
        expr("target_tokens * 10000 DIV avail_tokens"))
      .select(col("source"), col("n_docs"), col("avail_tokens"),
        col("target_tokens"), col("epochs"), col("rate_bp"))
      .orderBy(col("source"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each RAW document
    * by how much its hashed-n-gram profile looks drawn from the TARGET
    * distribution rather than the raw pool's own. Features are unigrams
    * plus space-joined bigrams, hashed into `buckets` integer buckets
    * (hash48 mod B); both bucket distributions get add-one smoothing.
    *
    * Scoring rule: the paper ranks by Σ_b c_doc[b]·(log p[b] − log q[b]);
    * logs are transcendental and engine-divergent in the last ulp, so —
    * exactly like [[bigramLmScore]]'s treatment of KenLM perplexity — we
    * rank by the RATIO-linearized form: per-bucket scaled likelihood ratio
    * r[b] = (scale·(ct[b]+1)·(Nq+B)) div ((cq[b]+1)·(Nt+B)), per-doc
    * weight = Σ occurrences r[bucket]. Integer-exact, portable, and
    * monotone in p/q per bucket; the linearization weights high-ratio
    * buckets more than the log form does (documented deviation — the
    * selection it induces favors the same target-like docs).
    *
    * Scale shape: the bucket table is B rows — its aggregation map-side
    * combines down to B entries per task, and the ratio frame broadcasts
    * back to the occurrence stream. The per-doc weight is ONE shuffle
    * (groupBy id, partially aggregated map-side). The corpus is scanned
    * twice (once per consumer) rather than exchanged once: the feature
    * stream is corpus×features wide, so a sharing repartition would move
    * far more bytes than the second pruned scan reads. All products run
    * in DECIMAL(38,0): at 100 TB, Nq ≈ 10^13 and scale·(ct+1)·(Nq+B)
    * overflows int64.
    *
    * Output: one row per raw (non-target) doc — id, weight (BIGINT).
    */
  def dsirWeights(df: DataFrame, idCol: Column, textCol: Column,
      isTarget: Column, buckets: Int = 512,
      scale: Long = 1000000L): DataFrame = {
    val feats = df.select(idCol.as("id"), isTarget.as("tgt"),
        TextAnalysis.tokens(textCol).as("t"))
      .select(col("id"), col("tgt"), explode(concat(col("t"), expr(
        """CASE WHEN size(t) >= 2 THEN transform(sequence(0, size(t) - 2),
             i -> concat(element_at(t, i + 1), ' ', element_at(t, i + 2)))
           ELSE CAST(array() AS ARRAY<STRING>) END"""))).as("g"))
      .select(col("id"), col("tgt"),
        (hash48(col("g")) % buckets).as("b"))
    val bc = feats.groupBy(col("b"))
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("tgt"), 0L).otherwise(1L)).as("cq"))
    val tot = bc.agg(sum(col("ct")).as("nt"), sum(col("cq")).as("nq"))
    val rb = bc.join(broadcast(tot))
      .withColumn("r", expr(
        s"""CAST((CAST($scale AS DECIMAL(38,0)) * (ct + 1) * (nq + $buckets))
            DIV (CAST(cq + 1 AS DECIMAL(38,0)) * (nt + $buckets)) AS BIGINT)"""))
      .select(col("b"), col("r"))
    feats.filter(!col("tgt"))
      .join(broadcast(rb), "b")
      .groupBy(col("id"))
      .agg(expr("CAST(sum(CAST(r AS DECIMAL(38,0))) AS BIGINT)").as("weight"))
  }

  /** Distribution-drift monitor: per-group total-variation distance
    * between the group's hashed-unigram bucket distribution and the
    * corpus-wide one — the production check that a source feeding the
    * pipeline hasn't silently changed character (scraper regression,
    * language flip, spam flood). TV = ½·Σ_b |p_g[b] − p[b]|.
    *
    * Integer-exact portability: with c = group bucket counts, C = corpus
    * bucket counts, N_g = Σc, N = ΣC, each term |c/N_g − C/N| equals
    * |c·N − C·N_g| / (N_g·N), so TV·2·N_g·N is an INTEGER. Buckets the
    * group never hits contribute Σ C[b]·N_g over the complement, folded
    * in algebraically as N_g·(N − Σ_present C) — no dense G×B frame, no
    * cross join. Reported as parts-per-million via integer DIV, the same
    * rational-linearization discipline as [[dsirWeights]].
    *
    * Scale shape: ONE corpus shuffle (groupBy (g, b), map-side combined
    * to ≤ G·B entries per task); everything after runs on the G·B-row
    * count frame — group totals, bucket totals and the grand total are
    * WINDOW sums over that frame, not separate aggregate-and-join
    * consumers (four aggregation branches would each re-scan and
    * re-shuffle the corpus: subplan fingerprints differ per branch, so
    * ReusedExchange never fires — ScaleSpec pins scans == 1). The
    * global-total window runs single-partition by construction — fine,
    * the frame is ≤ G·B ≈ 10^6 rows however big the corpus is.
    * DECIMAL(38,0) products: at 100 TB
    * N ≈ 10^13 so c·N ≈ 10^26 and the ppm-scaled sum ≈ 10^35 — past
    * int64, inside decimal-38. The reference distribution includes the
    * group itself (corpus-as-reference monitoring frame; self-mass
    * shrinks TV by (1 − N_g/N), immaterial for G ≫ 1 and irrelevant to
    * threshold-crossing alerts, which compare a group to its own
    * history).
    *
    * Output: one row per group — g, tv_ppm (BIGINT), 0 = identical to
    * corpus, 1e6 = disjoint support.
    */
  def distributionDrift(df: DataFrame, groupCol: Column, textCol: Column,
      buckets: Int = 512, scale: Long = 1000000L): DataFrame = {
    val gb = df.select(groupCol.as("g"), TextAnalysis.tokens(textCol).as("t"))
      .select(col("g"), explode(col("t")).as("w"))
      .select(col("g"), (hash48(col("w")) % buckets).as("b"))
      .groupBy(col("g"), col("b")).agg(count(lit(1)).as("c"))
    gb.withColumn("cb", sum(col("c")).over(Window.partitionBy(col("b"))))
      .withColumn("ng", sum(col("c")).over(Window.partitionBy(col("g"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
      .groupBy(col("g"))
      .agg(expr(
        s"""CAST((CAST($scale AS DECIMAL(38,0)) *
              (sum(abs(CAST(c AS DECIMAL(38,0)) * n
                       - CAST(cb AS DECIMAL(38,0)) * ng))
               + max(CAST(ng AS DECIMAL(38,0))) * (max(n) - sum(cb))))
            DIV (2 * max(CAST(ng AS DECIMAL(38,0))) * max(n))
            AS BIGINT)""").as("tv_ppm"))
  }

  /** Corpus snapshot diff: the delta between two corpus versions — the
    * regression check an incremental curation pipeline runs after every
    * rebuild (did the refresh add/drop/rewrite what the changelog says
    * it should?). One row per DIFFERING doc: id, verdict ∈ {added,
    * removed, changed}; unchanged docs are filtered OUT before the
    * result materializes, so output is |delta|, not |corpus| — the only
    * corpus-sized work is the two scans and one co-partitioned
    * full-outer join on id (content compares by md5 digest computed at
    * the scan, so the join carries 32-byte digests, never text).
    */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: Column,
      textCol: Column): DataFrame = {
    val o = oldDf.select(idCol.as("id"), md5(textCol).as("od"))
    val n = newDf.select(idCol.as("id"), md5(textCol).as("nd"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("verdict",
        when(col("od").isNull, "added")
          .when(col("nd").isNull, "removed")
          .when(col("od") =!= col("nd"), "changed"))
      .filter(col("verdict").isNotNull)
      .select(col("id"), col("verdict"))
  }

  /** Hashed-unigram bucket histogram of a corpus: (b, cb) — B rows
    * however large the input. This is the FROZEN-REFERENCE artifact for
    * [[driftAgainst]]: compute it once over the blessed corpus snapshot,
    * persist/collect its B rows, and every later drift check is a
    * broadcast against it — the reference is never rescanned (same
    * freeze-once discipline as the ANN index's quantizer).
    */
  def bucketCounts(df: DataFrame, textCol: Column,
      buckets: Int = 512): DataFrame =
    df.select(TextAnalysis.tokens(textCol).as("t"))
      .select(explode(col("t")).as("w"))
      .select((hash48(col("w")) % buckets).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cb"))

  /** Total-variation drift of each group against an EXTERNAL frozen
    * reference histogram (`ref` = (b, cb) from [[bucketCounts]],
    * `refTotal` = Σcb). Same integer-exact rationalization as
    * [[distributionDrift]]: tv_ppm = scale·(Σ_present |c·Nr − cb·Ng| +
    * Ng·(Nr − Σ_present cb)) DIV (2·Ng·Nr), where "present" = buckets
    * the group actually hits; reference-only buckets fold in
    * algebraically, batch-only buckets ride the left join's coalesce-0.
    *
    * Scale shape: one shuffle of the input (groupBy group cols + b,
    * map-side combined), then a broadcast left join against the B-row
    * reference — the reference corpus itself is NEVER touched here.
    */
  def driftAgainst(df: DataFrame, groupCols: Seq[String], textCol: Column,
      ref: DataFrame, refTotal: Long, buckets: Int = 512,
      scale: Long = 1000000L): DataFrame = {
    val gs = groupCols.map(col)
    val gb = df.select(gs :+ TextAnalysis.tokens(textCol).as("t"): _*)
      .select(gs :+ explode(col("t")).as("w"): _*)
      .select(gs :+ (hash48(col("w")) % buckets).as("b"): _*)
      .groupBy(gs :+ col("b"): _*).agg(count(lit(1)).as("c"))
      .withColumn("ng", sum(col("c")).over(Window.partitionBy(gs: _*)))
    gb.join(broadcast(ref), Seq("b"), "left")
      .withColumn("cb", coalesce(col("cb"), lit(0L)))
      .groupBy(gs: _*)
      .agg(expr(
        s"""CAST((CAST($scale AS DECIMAL(38,0)) *
              (sum(abs(CAST(c AS DECIMAL(38,0)) * $refTotal
                       - CAST(cb AS DECIMAL(38,0)) * ng))
               + max(CAST(ng AS DECIMAL(38,0)))
                 * ($refTotal - sum(CAST(cb AS DECIMAL(38,0))))))
            DIV (2 * max(CAST(ng AS DECIMAL(38,0))) * $refTotal)
            AS BIGINT)""").as("tv_ppm"))
  }

  /** Top-k DSIR selection — the paper's Gumbel-resampling step in its
    * temperature→0 limit (deterministic: no seeded-noise portability
    * hazard). Executes as TakeOrderedAndProject: per-partition partial
    * top-k then a k-row driver merge — no global sort, no single-reducer
    * window, k rows on the driver.
    */
  def dsirSelect(df: DataFrame, idCol: Column, textCol: Column,
      isTarget: Column, k: Int, buckets: Int = 512): DataFrame =
    dsirWeights(df, idCol, textCol, isTarget, buckets)
      .orderBy(col("weight").desc, col("id"))
      .limit(k)

  // ------------------------------------------------------ URL curation

  /** Canonicalize an absolute http(s) URL — the crawl-curation FRONT DOOR
    * (C4/RefinedWeb filter and dedup by URL before touching any text; the
    * reference's subject sanitize is the analogous key-normalization
    * step). Rules, in order:
    *
    *  - scheme and host[:port] lowercased (RFC 3986 §6.2.2.1); a
    *    userinfo (anything before the authority's last `@`) keeps its
    *    case — credentials are case-sensitive; path/query case is
    *    PRESERVED (it is significant on most origins);
    *  - one leading `www.` label stripped from the host;
    *  - the scheme's DEFAULT port stripped (`:80` for http, `:443` for
    *    https) — a non-default port is kept;
    *  - duplicate path slashes collapsed, the trailing slash stripped
    *    (except the root path), empty path → `/`;
    *  - UNAMBIGUOUS tracking query params dropped (`utm_*`, gclid,
    *    fbclid, msclkid, mc_cid, mc_eid); functional params survive —
    *    notably `ref`, which many origins use as a real selector
    *    (GitHub `?ref=branch`) — the survivors SORTED (byte order) so
    *    param-order variants collide, empty query dropped entirely;
    *  - the fragment dropped (never sent to the server).
    *
    * A pure codegen'd regexp/HOF chain — no UDF, no shuffle, the narrow
    * scan path — restricted to the pattern subset on which Java regex and
    * RE2 agree, so a DuckDB oracle replays it verbatim (DuckDB needs the
    * 'g' flag on its regexp_replace; Spark is global by default). Inputs
    * without a `scheme://` prefix pass through trimmed-unchanged (relative
    * URLs have no canonical absolute form without a base).
    */
  def urlCanonicalize(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val authRaw = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // userinfo (up to the LAST '@' — RFC 3986 authority grammar) keeps
    // its case: only the host is case-insensitive; lowercasing a
    // credential-bearing userinfo would conflate distinct URLs
    val userinfo = regexp_extract(authRaw, "^(.*)@", 1)
    val hostPort = lower(regexp_replace(authRaw, "^.*@", ""))
    val noWww = regexp_replace(hostPort, "^www\\.", "")
    val hp = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val auth = when(userinfo === "", hp)
      .otherwise(concat(userinfo, lit("@"), hp))
    val path0 = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path1 = regexp_replace(path0, "/{2,}", "/")
    val path = when(path1 === "", lit("/"))
      .otherwise(regexp_replace(path1, "(.)/$", "$1"))
    val q0 = regexp_extract(u, "^[^?#]*\\?([^#]*)", 1)
    val params = filter(split(q0, "&", -1), p =>
      p =!= "" && !p.rlike(
        "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|mc_cid|mc_eid)(=|$)"))
    val q = array_join(array_sort(params), "&")
    when(scheme === "", u).otherwise(concat(scheme, lit("://"), auth, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** The host of a canonical URL (userinfo and port excluded). Feed the
    * OUTPUT of [[urlCanonicalize]] (already lowercased,
    * www/default-port stripped; a case-preserved userinfo may remain —
    * the optional group skips it).
    */
  def urlHost(canonUrl: Column): Column =
    regexp_extract(canonUrl,
      "^[a-z][a-z0-9+.-]*://(?:[^/?#]*@)?([^/?#:]*)", 1)

  /** A public-suffix-LITE table: enough of the real PSL's shape — one-,
    * two- and three-label suffixes, including private-registry entries
    * (github.io, blogspot.com, s3.amazonaws.com) — to exercise every rule
    * of [[registrableDomain]]. Production swaps in the full list
    * (publicsuffix.org, ~9k entries): the operator broadcasts whatever
    * it is given and its join count depends only on the DEEPEST suffix,
    * not the list size.
    */
  val DefaultPublicSuffixes: Seq[String] = Seq(
    "com", "net", "org", "io", "dev", "edu", "gov",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "au", "com.au", "net.au",
    "jp", "co.jp", "ne.jp",
    "br", "com.br", "in", "co.in",
    "github.io", "blogspot.com", "s3.amazonaws.com")

  /** Registrable domain (eTLD+1): the label immediately left of the
    * LONGEST matching public suffix, plus that suffix — the key crawl
    * pipelines group by for per-site quotas and blocklists
    * ("news.bbc.co.uk" → "bbc.co.uk", not "co.uk").
    *
    * Shape: label arithmetic (split + slice — narrow, codegen'd) plus one
    * LEFT BROADCAST JOIN PER SUFFIX DEPTH (maxL = deepest suffix's label
    * count: 2–3 for PSL-lite, 5 for the full PSL) against the broadcast
    * suffix table. No explode, no re-aggregation, the row count never
    * changes — zero exchanges at any corpus size. Longest match wins
    * ("co.uk" beats "uk"); a host with no matching suffix falls back to
    * its last two labels; a host EQUAL to a multi-label suffix degrades
    * to the next-shorter rule (full-PSL "is itself a suffix" semantics
    * out of scope for the lite table).
    */
  def registrableDomain(df: DataFrame, hostCol: Column,
      suffixes: Seq[String] = DefaultPublicSuffixes,
      out: String = "domain"): DataFrame = {
    require(suffixes.nonEmpty, "suffix table must not be empty")
    val spark = df.sparkSession
    val maxL = suffixes.map(_.count(_ == '.') + 1).max
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val joined = (1 to maxL).foldLeft(df) { case (acc, l) =>
      // distinct per depth: a duplicated caller-supplied suffix would
      // make the left join match multiple identical rows and silently
      // DUPLICATE corpus rows downstream (suffix lists are set-valued)
      val ofLen = suffixes.filter(_.count(_ == '.') + 1 == l).distinct
      if (ofLen.isEmpty) acc
      else {
        val sfx = spark.createDataset(ofLen)(
          org.apache.spark.sql.Encoders.STRING).toDF(s"__sfx$l")
        // candidate = the host's last l labels; n > l keeps at least one
        // label LEFT of the suffix (a host that IS a suffix cannot match)
        val cand = when(n > l, array_join(slice(labels, -l, l), "."))
        acc.join(broadcast(sfx), cand === col(s"__sfx$l"), "left")
      }
    }
    val present = (1 to maxL).filter(l =>
      suffixes.exists(_.count(_ == '.') + 1 == l))
    // foldLeft ascending ⇒ the OUTERMOST when tests the longest suffix
    val matchLen = present.foldLeft(lit(0)) { case (acc, l) =>
      when(col(s"__sfx$l").isNotNull, lit(l)).otherwise(acc)
    }
    val regLen = when(matchLen > 0, matchLen + 1).otherwise(least(n, lit(2)))
    joined
      .withColumn(out, array_join(slice(labels, -regLen, regLen), "."))
      .drop(present.map(l => s"__sfx$l"): _*)
  }
}
