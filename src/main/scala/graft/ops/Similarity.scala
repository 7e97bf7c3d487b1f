package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Numeric portability: embeddings are quantized to integers
  * (round(x * 10000)) before any arithmetic, so dot products and norms are
  * exact BIGINT sums — identical regardless of engine, partitioning or
  * summation order. Only the final cosine is one IEEE double division —
  * deterministic. This also makes results reproducible across cluster sizes,
  * which float accumulation would not be.
  *
  * Scale paths:
  *  - brute force: one broadcast of the (small) query set against the corpus
  *    — a narrow map + per-query top-k aggregation; corpus is never
  *    self-joined;
  *  - sign-LSH bucketing: candidates restricted to equal random-hyperplane
  *    sign buckets — shuffle on bucket key, volume ∝ corpus + candidates.
  */
object Similarity {

  /** Quantize an array<float> to array<bigint> at 1e-4 resolution.
    * Half-away-from-zero rounding spelled out with floor/ceil — `round` /
    * integer CAST semantics differ across engines, floor/ceil do not.
    */
  def quantize(vec: Column, scale: Int = 10000): Column =
    transform(vec, x => {
      val d = x.cast("double") * scale
      when(x >= 0, floor(d + 0.5)).otherwise(ceil(d - 0.5)).cast("long")
    })

  /** Exact integer dot product of two quantized vectors — a native codegen
    * Expression ([[graft.functions.DotProductQ]]): the equivalent
    * `aggregate(zip_with(...))` formulation evaluates interpreted lambdas
    * per element and allocates the product array; this is the hottest
    * scalar kernel in the similarity family (|candidates| × dim per
    * query).
    */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.NativeDot.dotQNative(a, b)

  /** Exact integer squared norm. */
  def normSqQ(a: Column): Column = dotQ(a, a)

  /** Cosine similarity of two quantized vectors: exact integer dot / exact
    * integer norms, one double division + sqrt at the end.
    */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      sqrt(normSqQ(a).cast("double") * normSqQ(b).cast("double"))

  /** Add quantized vector + precomputed squared norm columns (compute once,
    * reuse across all comparisons — at 100 TB norms are a scan-time map, not
    * per-pair work).
    */
  def prepare(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("qvec", quantize(col(vecCol)))
      .withColumn("norm_sq", normSqQ(col("qvec")))

  /** Per-label centroids in exact integer form: member count `n`, the
    * elementwise sum vector `sv` (the centroid scaled by n — kept as
    * BIGINTs so no division happens until comparison time) and the sum
    * vector's squared norm `ss`. Two aggregations: (label, dim) partial
    * sums — map-side combinable, at most |labels|·dims groups — then
    * reassembly of the ordered sum vector per label. The result is tiny
    * (|labels| rows) and meant to be broadcast.
    */
  def labelCentroids(prepared: DataFrame, labelCol: String): DataFrame =
    prepared.select(col(labelCol).as("clabel"),
        posexplode(col("qvec")).as(Seq("j", "qj")))
      .groupBy(col("clabel"), col("j"))
      .agg(sum(col("qj")).as("sj"), count(lit(1)).as("n"))
      .groupBy(col("clabel"))
      .agg(max(col("n")).as("n"),
        transform(array_sort(collect_list(struct(col("j"), col("sj")))),
          s => s.getField("sj")).as("sv"),
        sum(col("sj") * col("sj")).as("ss"))

  /** Nearest-centroid label assignment (Rocchio classification — the
    * label-quality / mislabel-detection pass over an embedding corpus).
    *
    * Exactness: with centroid = sv/n, squared distance scaled by n² is
    * integer: n²·|x|² − 2n·(x·sv) + |sv|² — all BIGINT via the native dot
    * kernel; the cross-label comparison divides by n² once in IEEE double
    * (deterministic), with the label id as tie-break. Scale shape: one
    * broadcast of |labels| centroids against the corpus (narrow map +
    * native dot per (vector, label)), one window per vector over |labels|
    * rows. No self-join, no collect.
    *
    * Output: id, label (true), pred, d2_num, n (pred centroid's member
    * count) — d2_num/n² is the squared distance ×10⁸ (quantized units).
    */
  def centroidClassify(prepared: DataFrame, idCol: String,
      labelCol: String): DataFrame = {
    val cents = labelCentroids(prepared, labelCol)
    val pairs = prepared
      .select(col(idCol).as("id"), col(labelCol).as("label"),
        col("qvec"), col("norm_sq"))
      .crossJoin(broadcast(cents))
      .withColumn("d2_num",
        col("n") * col("n") * col("norm_sq")
          - lit(2L) * col("n") * dotQ(col("qvec"), col("sv")) + col("ss"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      .orderBy((col("d2_num").cast("double") / (col("n") * col("n"))).asc,
        col("clabel"))
    pairs.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("id"), col("label"), col("clabel").as("pred"),
        col("d2_num"), col("n"))
  }

  /** Distributed Lloyd k-means over quantized vectors (the embedding-
    * clustering pass of a curation pipeline — cluster-balanced sampling,
    * per-cluster quality audits, SemDeDup-style cell assignment all start
    * here).
    *
    * Exactness: centroids are never divided into floats — each is the
    * exact rational sv/n carried as (member count `n`, elementwise BIGINT
    * sum vector `sv`, its squared norm `ss`), so the assignment metric
    * n²·|x|² − 2n·(x·sv) + |sv|² is an exact integer and the only IEEE
    * step is one double division (÷n²) inside the cross-centroid
    * comparison — deterministic regardless of partitioning or summation
    * order, and replayable verbatim by any engine (the DuckDB oracle runs
    * the identical unrolled iterations). Ties break to the lowest
    * centroid id. Seeds are the k lowest ids. Empty clusters keep their
    * previous centroid.
    *
    * Scale shape (the MLlib KMeans loop, re-expressed declaratively): per
    * iteration one NARROW argmin pass — the k centroids ride along as a
    * literal array folded per row, no crossJoin, no window, zero
    * shuffle — then one map-side-combinable (cid, dim) partial
    * aggregation whose shuffle volume is ≤ k·dims·partitions rows, and a
    * k-row collect (centroids are driver-state between iterations exactly
    * as in MLlib). Nothing scales with corpus size except the narrow
    * scans.
    *
    * Output (one row per centroid, all stats exact BIGINTs): cluster_id,
    * n_members, n_cent (the centroid's rational denominator), inertia_num
    * (Σ members' n²-scaled squared distances), sv_checksum
    * (Σ (j+1)·sv_j), ss.
    */
  def kMeans(prepared: DataFrame, idCol: String, k: Int,
      iters: Int, seeding: Seeding = SeedLowestIds): DataFrame = {
    val spark = prepared.sparkSession
    val (cents, finalAssign) = lloyd(prepared, idCol, k, iters, seeding)
    val memberStats = finalAssign.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"), sum(col("d2num")).as("inertia_num"))
    val centRows = cents.toSeq.map { case (cid, n, sv, ss) =>
      (cid, n, ss, sv.zipWithIndex.map { case (v, j) => (j + 1L) * v }.sum)
    }
    import spark.implicits._
    val centDf = centRows.toDF("cluster_id", "n_cent", "ss", "sv_checksum")
    centDf.join(memberStats.withColumnRenamed("cid", "cluster_id"),
        Seq("cluster_id"), "left")
      .select(col("cluster_id"),
        coalesce(col("n_members"), lit(0L)).as("n_members"),
        col("n_cent"),
        coalesce(col("inertia_num"), lit(0L)).as("inertia_num"),
        col("sv_checksum"), col("ss"))
  }

  /** The trained-assignment view of [[kMeans]] — identical seeds,
    * iterations and tie rules, returning the final per-vector assignment
    * (idCol, cid, d2num) instead of per-cluster stats: the stratum key
    * for cluster-balanced sampling and per-cluster curation audits.
    */
  def kMeansAssign(prepared: DataFrame, idCol: String, k: Int,
      iters: Int, seeding: Seeding = SeedLowestIds): DataFrame =
    lloyd(prepared, idCol, k, iters, seeding)._2
      .select(col(idCol), col("cid"), col("d2num"))

  /** The trained centroids alone — the FROZEN QUANTIZER to route later
    * arrivals against (see [[routeToCentroids]]).
    */
  def kMeansCentroids(prepared: DataFrame, idCol: String, k: Int,
      iters: Int, seeding: Seeding = SeedLowestIds): Array[(Int, Long, Array[Long], Long)] =
    lloyd(prepared, idCol, k, iters, seeding)._1

  /** Seed-selection strategy for the Lloyd loop. Both are deterministic
    * and RNG-free, so results reproduce bit-for-bit across runs,
    * cluster layouts and engines (the property every op here keeps).
    */
  sealed trait Seeding

  /** Seeds = the k lowest ids. Oracle-trivial and cheap (one TakeOrdered)
    * but clusters poorly on skew: adjacent ids often share an embedding
    * mode, so several seeds can land in one dense region.
    */
  case object SeedLowestIds extends Seeding

  /** Deterministic farthest-point (k-center) seeding — the k-means++
    * SHAPE without its RNG (D² sampling would need a seeded generator
    * whose stream no other engine reproduces; the greedy max-min choice
    * is the same spread-the-seeds idea, made exact): seed 1 is the row
    * with the minimum (hash48(id), id) — a deterministic pseudo-random
    * draw — and each next seed maximizes its distance to the chosen set
    * (exact integer d² between quantized vectors, ties to the lowest
    * id). Cost: k−1 extra corpus scans (each a TakeOrdered(1) — partial
    * top-1 per partition, single-row driver merge) over the SAME cached
    * frame the Lloyd loop re-reads, each scan a narrow fold over ≤ k
    * seed literals. DedupSpec pins lower inertia than [[SeedLowestIds]]
    * on a skewed fixture.
    */
  case object SeedFarthestPoint extends Seeding

  /** The farthest-point seed set (see [[SeedFarthestPoint]]): k seeds as
    * (cid-in-selection-order, n=1, sv, ss).
    */
  def farthestPointSeeds(prepared: DataFrame, idCol: String,
      k: Int): Array[(Int, Long, Array[Long], Long)] = {
    require(k >= 1, "k must be positive")
    def seedOf(r: org.apache.spark.sql.Row): (Array[Long], Long) =
      (r.getSeq[Long](0).toArray, r.getLong(1))
    val first = prepared
      .orderBy(TextAnalysis.hash48(col(idCol).cast("string")), col(idCol))
      .select(col("qvec"), col("norm_sq")).limit(1).collect()
    require(first.nonEmpty, "corpus must not be empty")
    var seeds = Vector(seedOf(first(0)))
    for (_ <- 2 to k) {
      // min exact d² to the chosen set = the shared argmin fold's d2num
      // (seeds have n = 1, so d2num IS the exact integer distance)
      val centArr = array(seeds.zipWithIndex.map { case ((sv, ss), i) =>
        struct(lit(i).as("cid"), lit(1L).as("n"),
          array(sv.map(lit(_)): _*).as("sv"), lit(ss).as("ss"))
      }: _*)
      val next = prepared
        .withColumn("__best", bestCentroid(centArr))
        .orderBy(col("__best.d2num").desc, col(idCol).asc)
        .select(col("qvec"), col("norm_sq")).limit(1).collect()
      seeds :+= seedOf(next(0))
    }
    seeds.zipWithIndex.map { case ((sv, ss), i) => (i, 1L, sv, ss) }.toArray
  }

  /** Ceiling on the centroid VALUE COUNT (k·dims) inlined as plan
    * literals by [[routeToCentroids]]. Below it, centroids ride in the
    * expression tree — plan DEPTH is O(1) (one HOF fold) but plan SIZE
    * is O(k·dims) literals: fine for the quantizer regime (k ≤ ~10²),
    * a planner/codegen hazard at k ≳ 10⁴ (megabyte plans, constant-pool
    * pressure). Above it, the centroids ride in a one-row BROADCAST
    * RELATION instead (see below) — same arithmetic, O(1) plan size.
    */
  val RouteLiteralMaxValues: Int = 8192

  /** One-row carrier for the broadcast-relation routing path. */
  private case class CentroidRow(cid: Int, n: Long, sv: Array[Long], ss: Long)

  /** The shared argmin fold over an array-of-centroid-structs column
    * (fields cid/n/sv/ss): nearest exact-rational centroid, one double
    * ÷n² per comparison, ties to the earlier (lower-cid) entry.
    */
  private def bestCentroid(centArr: Column): Column = {
    val init = struct(lit(Double.PositiveInfinity).as("d2"),
      lit(-1).as("cid"), lit(0L).as("d2num"))
    aggregate(centArr, init, (acc, c) => {
      val n = c.getField("n")
      val d2num = n * n * col("norm_sq") -
        lit(2L) * n * dotQ(col("qvec"), c.getField("sv")) +
        c.getField("ss")
      val d2 = d2num.cast("double") / (n * n)
      when(d2 < acc.getField("d2"),
        struct(d2.as("d2"), c.getField("cid").as("cid"),
          d2num.as("d2num"))).otherwise(acc)
    })
  }

  /** Route prepared vectors to their nearest trained centroid — the
    * stateless narrow argmin of [[kMeans]]'s fold, applicable to batch
    * AND STREAMING frames (online ingestion cluster routing against a
    * frozen quantizer: no state, no shuffle, so the streamed assignment
    * is bit-identical to the batch one). Adds `cid` and `d2num`.
    *
    * Centroid transport picks itself by k·dims (override `literalMax`
    * only in tests): at quantizer scale the centroids inline as plan
    * literals; past [[RouteLiteralMaxValues]] they ride a ONE-ROW
    * broadcast relation crossJoined in (BroadcastNestedLoopJoin of a
    * single row: row count unchanged, no exchange) and the SAME fold
    * reads the array column — identical assignments on either path
    * (ScaleSpec pins equality and that the big-k path engages).
    */
  def routeToCentroids(df: DataFrame,
      cents: Array[(Int, Long, Array[Long], Long)],
      literalMax: Int = RouteLiteralMaxValues): DataFrame = {
    val dims = if (cents.isEmpty) 0 else cents.head._3.length
    val values = cents.length.toLong * math.max(dims, 1)
    val withBest =
      if (values <= literalMax) {
        val centArr = array(cents.map { case (cid, n, sv, ss) =>
          struct(lit(cid).as("cid"), lit(n).as("n"),
            array(sv.map(lit(_)): _*).as("sv"), lit(ss).as("ss"))
        }: _*)
        df.withColumn("best", bestCentroid(centArr))
      } else {
        val spark = df.sparkSession
        import spark.implicits._
        val centDf = Seq(cents.toSeq.map { case (cid, n, sv, ss) =>
          CentroidRow(cid, n, sv, ss)
        }).toDF("__cents")
        df.crossJoin(broadcast(centDf))
          .withColumn("best", bestCentroid(col("__cents")))
          .drop("__cents")
      }
    withBest
      .withColumn("cid", col("best.cid"))
      .withColumn("d2num", col("best.d2num"))
      .drop("best")
  }

  /** The shared Lloyd loop behind [[kMeans]]/[[kMeansAssign]]: returns the
    * trained exact-rational centroids and the final assignment frame.
    */
  private def lloyd(prepared0: DataFrame, idCol: String, k: Int,
      iters: Int, seeding: Seeding = SeedLowestIds)
      : (Array[(Int, Long, Array[Long], Long)], DataFrame) = {
    // Lloyd re-reads the corpus 2·iters+1 times (seed collect, one
    // assign scan + one (cid,dim) aggregation per iteration): without
    // this persist every pass would replay the upstream scan +
    // quantization, the same reason ivfTopK persists its sample frame.
    // Unpersisted EAGERLY below once training ends — repeated
    // kMeans/kMeansAssign calls in a bench round would otherwise leave
    // corpus-sized cached copies alive until the ContextCleaner runs.
    val prepared = prepared0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def assign(cents: Array[(Int, Long, Array[Long], Long)]): DataFrame =
      routeToCentroids(prepared, cents)

    def update(assigned: DataFrame,
        prev: Array[(Int, Long, Array[Long], Long)])
        : Array[(Int, Long, Array[Long], Long)] = {
      val upd = assigned
        .select(col("cid"), posexplode(col("qvec")).as(Seq("j", "qj")))
        .groupBy(col("cid"), col("j"))
        .agg(sum(col("qj")).as("sj"), count(lit(1)).as("cnt"))
        .groupBy(col("cid"))
        .agg(max(col("cnt")).as("n"),
          transform(array_sort(collect_list(struct(col("j"), col("sj")))),
            s => s.getField("sj")).as("sv"),
          sum(col("sj") * col("sj")).as("ss"))
        .collect()
        .map(r => r.getInt(0) ->
          ((r.getLong(1), r.getSeq[Long](2).toArray, r.getLong(3))))
        .toMap
      prev.map { case (cid, n, sv, ss) =>
        upd.get(cid).map { case (n2, sv2, ss2) => (cid, n2, sv2, ss2) }
          .getOrElse((cid, n, sv, ss))
      }
    }

    var cents: Array[(Int, Long, Array[Long], Long)] = seeding match {
      case SeedLowestIds =>
        prepared.orderBy(col(idCol)).limit(k)
          .select(col("qvec"), col("norm_sq")).collect()
          .zipWithIndex.map { case (r, i) =>
            (i, 1L, r.getSeq[Long](0).toArray, r.getLong(1))
          }
      case SeedFarthestPoint => farthestPointSeeds(prepared, idCol, k)
    }
    for (_ <- 1 to iters) cents = update(assign(cents), cents)
    // training actions are done with the cache; free it now. The final
    // assignment rides on the UNPERSISTED lineage (one extra upstream
    // scan when the caller evaluates it — callers that iterate over the
    // assignment further can persist it themselves), so no cached copy
    // of the corpus outlives this call.
    prepared.unpersist(blocking = false)
    (cents, routeToCentroids(prepared0, cents))
  }

  private def pairCosine: Column =
    col("dot").cast("double") /
      sqrt(col("q.norm_sq").cast("double") * col("c.norm_sq").cast("double"))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors by (cosine desc, id asc). The query side is broadcast (small);
    * ranking is a window per query id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = queries.alias("q")
      .join(corpus.alias("c"), col("q.id") =!= col("c.id"))
      .withColumn("dot", dotQ(col("q.qvec"), col("c.qvec")))
      .withColumn("cosine", pairCosine)
    val w = Window.partitionBy(col("q.id")).orderBy(col("cosine").desc, col("c.id"))
    joined
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** Embedding-cosine benchmark DECONTAMINATION — the cross-set
    * (train × eval) form of semantic near-dup: flag every corpus
    * vector whose cosine to ANY eval vector reaches τ = tauNum/tauDen.
    * The verdict is EXACT RATIONAL arithmetic end to end: cos ≥ τ ⟺
    * dot > 0 ∧ dot²·tauDen² ≥ tauNum²·‖c‖²·‖e‖², products riding
    * DECIMAL(38,0) (dot² alone overflows int64 at the 1e4 quantize
    * scale) — no IEEE rounding can flip a verdict on any engine. Like
    * [[Dedup.simhashCrossPairs]] there is deliberately no self-pair
    * guard: an eval vector present in the corpus IS the worst leak,
    * and a positively-scaled copy (cos ≈ 1) is the paraphrase-leak
    * shape n-gram decontamination misses.
    *
    * Shape (default, `cellBits` > 0): the |corpus|×|eval| exact-dot
    * product is PRUNED by a recall-complete cell prefilter before any
    * dot is computed —
    *  1. every corpus vector lands in one of 2^cellBits sign cells
    *     (sign pattern of the first quantized dimensions — a narrow
    *     projection);
    *  2. per cell, one map-side-combinable aggregation collects the
    *     exact INTEGER bounding box (component-wise min/max of qvec)
    *     and the minimum ‖·‖² — 2^cellBits rows, broadcast class;
    *  3. each eval vector is tested against each cell's box (|eval| ×
    *     2^cellBits — the only nested-loop join left, on the two TINY
    *     relations): interval arithmetic gives ub = Σⱼ max(mnⱼeⱼ, mxⱼeⱼ)
    *     ≥ dot(x, e) for every x in the cell, so a cell survives for e
    *     iff ub > 0 ∧ ub²·tauDen² ≥ tauNum²·min‖x‖²·‖e‖² — every
    *     comparison in the same exact integer/DECIMAL arithmetic as the
    *     verdict itself, hence PROVABLY recall-complete: x qualifying ⇒
    *     dot ≤ ub and ‖x‖² ≥ min‖x‖² ⇒ its (cell, e) pair survives.
    *     No float enters the prune, so no rounding can break the proof;
    *  4. corpus joins the surviving (cell, eid) pairs on the cell key —
    *     a BroadcastHashJoin, NOT a cross product — and only those
    *     pairs pay the exact dot. Verdicts are bit-identical to the
    *     unpruned form (spec-pinned); `cellBits = 0` keeps the plain
    *     broadcast cross join (|eval| ≪ corpus, the same bounded-build
    *     class as [[bruteForceTopK]]'s query side).
    *
    * Output: contaminated ids only — (id, n_hits, first_eval_id = min
    * matching eval id, the audit evidence). Both inputs are
    * [[prepare]]-shaped.
    */
  def embedDecontaminate(corpus: DataFrame, evalSet: DataFrame,
      tauNum: Long, tauDen: Long, cellBits: Int = 6): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"tau must be a rational in (0, 1], got $tauNum/$tauDen")
    require(cellBits >= 0 && cellBits <= 16,
      s"cellBits must be in [0, 16], got $cellBits")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // the τ squares are built in BigDecimal BEFORE becoming literals:
    // squaring in Long silently wraps past tauDen > sqrt(Long.Max) ≈
    // 3.037e9 and would flip verdicts — exactly the silent-desync class
    // this operator exists to prevent (r13 advice)
    val tauNum2 = lit(BigDecimal(tauNum) * BigDecimal(tauNum)).cast(dec)
    val tauDen2 = lit(BigDecimal(tauDen) * BigDecimal(tauDen)).cast(dec)
    def exact(pairs: DataFrame): DataFrame = pairs
      .withColumn("__d", dotQ(col("qvec"), col("evec")))
      .filter(col("__d") > 0 &&
        col("__d").cast(dec) * col("__d").cast(dec) * tauDen2 >=
        tauNum2 * col("norm_sq").cast(dec) * col("en").cast(dec))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"), min(col("eid")).as("first_eval_id"))
    val e = evalSet.select(col("id").as("eid"),
      col("qvec").as("evec"), col("norm_sq").as("en"))
    if (cellBits == 0) exact(corpus.crossJoin(broadcast(e)))
    else {
      // one-row bounded driver read: the vector dimensionality
      val dim = corpus.select(size(col("qvec")).as("d")).head.getInt(0)
      val cellOf = (0 until cellBits).map { j =>
        when(element_at(col("qvec"), j + 1) >= 0L, lit(1L << j))
          .otherwise(lit(0L))
      }.reduce(_ + _)
      val cells = corpus.withColumn("__cell", cellOf)
      val boxAggs = (1 to dim).flatMap(j => Seq(
        min(element_at(col("qvec"), j)).as(s"__mn$j"),
        max(element_at(col("qvec"), j)).as(s"__mx$j"))) :+
        min(col("norm_sq")).as("__mnn")
      val stats = cells.groupBy(col("__cell"))
        .agg(boxAggs.head, boxAggs.tail: _*)
        .select(col("__cell"),
          array((1 to dim).map(j => col(s"__mn$j")): _*).as("__mns"),
          array((1 to dim).map(j => col(s"__mx$j")): _*).as("__mxs"),
          col("__mnn"))
      val ub = aggregate(sequence(lit(1), lit(dim)), lit(0L),
        (acc, j) => acc + greatest(
          element_at(col("__mns"), j) * element_at(col("evec"), j),
          element_at(col("__mxs"), j) * element_at(col("evec"), j)))
      val survivors = e.crossJoin(broadcast(stats))
        .withColumn("__ub", ub)
        .filter(col("__ub") > 0 &&
          col("__ub").cast(dec) * col("__ub").cast(dec) * tauDen2 >=
          tauNum2 * col("__mnn").cast(dec) * col("en").cast(dec))
        .select(col("__cell"), col("eid"), col("evec"), col("en"))
      exact(cells.join(broadcast(survivors), Seq("__cell")).drop("__cell"))
    }
  }

  /** Random-hyperplane sign-LSH bucket from the first `bits` dimensions:
    * bit j = (vec[j] >= 0). With unit-ish embeddings this is an 2^bits-way
    * partitioner whose collision probability rises with cosine similarity.
    * (For production, project onto `bits` fixed pseudo-random hyperplanes;
    * axis-aligned planes keep the arithmetic engine-portable here.)
    */
  def signBucket(vec: Column, bits: Int = 12): Column =
    (0 until bits).map { j =>
      when(element_at(vec, j + 1) >= 0f, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic ±1 pseudo-random hyperplane signs: sign(j,i) is the
    * parity of the portable 48-bit md5 hash of "rp_<j>_<i>". The table is
    * computable in any engine (the oracle embeds it as literals), unlike
    * RNG-seeded planes. Random hyperplanes make bucket collisions a
    * function of the angle alone — the axis-aligned [[signBucket]] depends
    * on the coordinate basis and degrades when mass concentrates on few
    * dimensions.
    */
  def rpSigns(bits: Int, dims: Int): Array[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(bits, dims) { (j, i) =>
      val hex = md.digest(s"rp_${j}_$i".getBytes("UTF-8"))
        .take(6).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1L else -1L
    }
  }

  /** Random-hyperplane sign-LSH bucket over the QUANTIZED vector: bit j =
    * (qvec · signs(j) >= 0). Exact integer dots — engine-portable, and the
    * ±1 planes need no multiplication beyond sign flips.
    */
  def rpBucket(qvec: Column, bits: Int, dims: Int = 64): Column = {
    val signs = rpSigns(bits, dims)
    signs.zipWithIndex.map { case (cs, j) =>
      // native codegen'd dot (DotProductQ) against the literal plane —
      // the HOF formulation (aggregate∘zip_with) runs interpreted lambdas
      // per element: bits × dims evals per row on the scan hot path
      val dot = dotQ(qvec, lit(cs))
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Shared per-bucket exact-cosine ranking used by both bucketing
    * strategies. One shuffle on the bucket key; volume ∝ corpus +
    * candidate blocks, never n².
    */
  private def topKWithinBucket(bucketed: DataFrame, queryPred: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val queries = bucketed.filter(queryPred)
    val joined = queries.alias("q")
      .join(bucketed.alias("c"),
        col("q.bucket") === col("c.bucket") && col("q.id") =!= col("c.id"))
      .withColumn("dot", dotQ(col("q.qvec"), col("c.qvec")))
      .withColumn("cosine", pairCosine)
    val w = Window.partitionBy(col("q.id")).orderBy(col("cosine").desc, col("c.id"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** Bucketed ANN top-k: candidates share the sign-LSH bucket; ranking as in
    * brute force. Recall < 1 by construction (that is the scale trade-off);
    * the bucket join replaces the n² pair space with per-bucket blocks.
    */
  def bucketedTopK(prepared: DataFrame, queryPred: Column, bits: Int, k: Int): DataFrame =
    topKWithinBucket(
      prepared.withColumn("bucket", signBucket(col("embedding"), bits)),
      queryPred, k)

  /** Hard-negative mining for contrastive retrieval training: for each
    * anchor (rows matching `queryPred`), the k most-cosine-similar corpus
    * vectors with a DIFFERENT label — the "close but wrong" examples
    * that carry training signal random negatives don't (the DPR/ANCE
    * recipe: negatives are mined from the current index's near
    * neighbors, not sampled uniformly).
    *
    * Scale shape: candidate generation is the sign-LSH bucket join (the
    * same per-bucket blocks as [[bucketedTopK]] — never n² pairs), and
    * the anti-label predicate sits IN the join condition, so
    * similar-but-same-label pairs (the positives — usually the densest
    * neighborhood of any anchor) are dropped before the rank window ever
    * sees them. Ranking is exact within the candidate set, ties broken
    * by id; everything integer-quantized, so an external engine
    * reproduces it bit-for-bit.
    */
  def hardNegatives(prepared: DataFrame, queryPred: Column,
      labelCol: String, bits: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed =
      prepared.withColumn("bucket", signBucket(col("embedding"), bits))
    val joined = bucketed.filter(queryPred).alias("q")
      .join(bucketed.alias("c"),
        col("q.bucket") === col("c.bucket") &&
          col(s"q.$labelCol") =!= col(s"c.$labelCol"))
      .withColumn("dot", dotQ(col("q.qvec"), col("c.qvec")))
      .withColumn("cosine", pairCosine)
    val w = Window.partitionBy(col("q.id"))
      .orderBy(col("cosine").desc, col("c.id"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q.id").as("query_id"),
        col(s"q.$labelCol").as("anchor_label"),
        col("c.id").as("negative_id"),
        col(s"c.$labelCol").as("negative_label"),
        col("cosine"), col("rank"))
  }

  /** ANN top-k with random-hyperplane buckets (the production variant of
    * [[bucketedTopK]] — basis-independent collision probability).
    */
  def rpBucketedTopK(prepared: DataFrame, queryPred: Column, bits: Int,
      k: Int, dims: Int = 64): DataFrame =
    topKWithinBucket(
      prepared.withColumn("bucket", rpBucket(col("qvec"), bits, dims)),
      queryPred, k)

  /** Multi-probe rp-LSH ANN top-k: each query probes its own bucket PLUS
    * the `nProbe-1` neighbor buckets reached by flipping its lowest-margin
    * plane bits (margin = |qvec · plane|: the planes the query sits closest
    * to are the ones most likely to split it from near neighbors). The
    * standard production recall/cost dial — multi-probe recovers most of
    * the recall lost to bucket boundaries at a cost of nProbe× candidate
    * volume, WITHOUT growing the index (vs more tables/bits).
    *
    * Everything stays integer-exact (dots, margins, buckets), so results
    * are engine-reproducible; ties in margin break by plane index.
    */
  def multiProbeTopK(prepared: DataFrame, queryPred: Column, bits: Int,
      nProbe: Int, k: Int, dims: Int = 64): DataFrame = {
    require(nProbe >= 1 && nProbe <= bits + 1, s"nProbe must be in [1, bits+1]")
    val signs = rpSigns(bits, dims)
    val corpus = prepared.withColumn("bucket", rpBucket(col("qvec"), bits, dims))
    val pow2 = lit((0 until bits).map(1L << _).toArray)
    val withDots = prepared.filter(queryPred)
      .withColumns((0 until bits).map(j => s"dot_$j" -> dotQ(col("qvec"), lit(signs(j)))).toMap)
    val bucket = (0 until bits).map(j =>
      when(col(s"dot_$j") >= 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    val margins = sort_array(array((0 until bits).map(j =>
      struct(abs(col(s"dot_$j")).as("m"), lit(j).as("j"))): _*))
    val queries = withDots
      .withColumn("bucket", bucket)
      .withColumn("probe_bucket", explode(concat(
        array(col("bucket")),
        transform(slice(margins, 1, nProbe - 1), s =>
          col("bucket").bitwiseXOR(element_at(pow2, s.getField("j") + 1))))))
      .select(col("id"), col("qvec"), col("norm_sq"), col("probe_bucket"))
    import org.apache.spark.sql.expressions.Window
    val joined = queries.alias("q")
      .join(corpus.alias("c"),
        col("q.probe_bucket") === col("c.bucket") && col("q.id") =!= col("c.id"))
      .withColumn("dot", dotQ(col("q.qvec"), col("c.qvec")))
      .withColumn("cosine", pairCosine)
    val w = Window.partitionBy(col("q.id")).orderBy(col("cosine").desc, col("c.id"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** IVF (inverted-file) ANN top-k — the classic coarse-quantizer scale
    * path: KMeans centroids partition the corpus into cells; each query
    * probes its `nProbe` nearest cells and ranks candidates by exact
    * quantized cosine. Recall rises with nProbe; cost is |corpus|/nCells ×
    * nProbe per query instead of |corpus|.
    *
    * The cell assignment is one MLlib KMeans fit (seeded — deterministic
    * within Spark, but not engine-portable, so IVF queries get rows-only
    * driver checks).
    */
  def ivfTopK(prepared: DataFrame, queryPred: Column, nCells: Int, nProbe: Int,
      k: Int): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.expressions.Window
    val withVec = prepared.withColumn("fvec",
        array_to_vector(transform(col("embedding"), _.cast("double"))))
      // KMeans is iterative: without this persist every iteration re-reads
      // the source and re-runs quantize + array_to_vector.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // A coarse quantizer does not need converged centroids — cells only
    // shape candidate recall and the ranking is exact — so cap the
    // iterations (default 20 measured ~2x the fit time for identical
    // query results at nProbe>=2).
    val km = new KMeans().setK(nCells).setSeed(42L).setMaxIter(8)
      .setFeaturesCol("fvec").setPredictionCol("cell")
    val model = km.fit(withVec)
    val assigned = model.transform(withVec).drop("fvec")
    // query -> nProbe nearest cells by centroid distance (driver-side
    // centroid list is tiny: nCells × dim)
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray)
    }.toSeq
    val centroidDf = prepared.sparkSession.createDataFrame(centroids)
      .toDF("cell", "centroid")
    val qToCell = assigned.filter(queryPred).select(col("id").as("qid"), col("qvec"), col("norm_sq"))
      .crossJoin(broadcast(centroidDf))
      .withColumn("dist", aggregate(
        zip_with(col("qvec"), col("centroid"), (a, b) => (a.cast("double") / 10000 - b) * (a.cast("double") / 10000 - b)),
        lit(0.0), (acc, v) => acc + v))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dist"), col("cell"))))
      .filter(col("rk") <= nProbe)
      .select(col("qid"), col("qvec").as("q_qvec"), col("norm_sq").as("q_norm"), col("cell"))
    val joined = qToCell.join(assigned.select(col("id").as("cid"), col("qvec").as("c_qvec"),
        col("norm_sq").as("c_norm"), col("cell")), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine", dotQ(col("q_qvec"), col("c_qvec")).cast("double") /
        sqrt(col("q_norm").cast("double") * col("c_norm").cast("double")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("cid").as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** IVF top-k with a DETERMINISTIC sampled coarse quantizer: the cells'
    * centroids are nCells corpus vectors chosen by md5(id) rank (a
    * uniform, engine-reproducible sample — the classic random-sample
    * initialization with zero Lloyd iterations; a coarse quantizer only
    * shapes candidate recall, the ranking below it is exact, so converged
    * centroids buy recall but are not required for correctness). Because
    * each centroid IS a quantized corpus vector, cell assignment is pure
    * BIGINT arithmetic — d2(x,s) = |x|² − 2·(x·s) + |s|² — making the
    * entire pipeline portable enough for the DuckDB oracle to check
    * bit-for-bit (the MLlib-KMeans [[ivfTopK]] beside this is exactness-
    * pinned in-suite instead: nProbe=nCells must equal brute force).
    *
    * Scale shape: seed pick is a distributed top-nCells
    * (TakeOrderedAndProject, no global sort), assignment is one broadcast
    * of nCells seeds against the corpus (narrow map + native dot), then
    * the usual cell-join + per-query window. No self-join, no collect.
    */
  def ivfSeededTopK(prepared: DataFrame, queryPred: Column, nCells: Int,
      nProbe: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seedPick = prepared
      .select(col("id").as("seed_id"), col("qvec").as("seed_qvec"),
        col("norm_sq").as("seed_norm"),
        md5(col("id").cast("string")).as("h"))
      .orderBy(col("h"), col("seed_id")).limit(nCells)
    // cell ids 1..nCells in seed-rank order (window over nCells rows only)
    val seeds = seedPick
      .withColumn("cell", row_number()
        .over(Window.orderBy(col("h"), col("seed_id"))).cast("long"))
      .drop("h")
    def withD2(df: DataFrame): DataFrame = df
      .crossJoin(broadcast(seeds))
      .withColumn("d2", col("norm_sq")
        - lit(2L) * dotQ(col("qvec"), col("seed_qvec")) + col("seed_norm"))
    // corpus assignment: argmin over nCells as an AGGREGATE, not a window
    // — min(struct(d2, cell)) is the lexicographic minimum (same
    // (d2 asc, cell asc) tie-break), and partial aggregation collapses
    // the nCells-per-row expansion map-side, so the exchange carries 1×
    // the corpus instead of the window's nCells× (which also sorts)
    val corpus = withD2(prepared.select(col("id"), col("qvec"), col("norm_sq")))
      .groupBy(col("id"), col("qvec"), col("norm_sq"))
      .agg(min(struct(col("d2"), col("cell"))).as("m"))
      .select(col("id").as("cid"), col("qvec").as("c_qvec"),
        col("norm_sq").as("c_norm"), col("m.cell").as("cell"))
    // probe selection needs the nProbe SMALLEST cells per query — a
    // window over the (tiny, queryPred-filtered) query side only
    val cellW = Window.partitionBy(col("id")).orderBy(col("d2"), col("cell"))
    val queries = withD2(prepared.filter(queryPred)
        .select(col("id"), col("qvec"), col("norm_sq")))
      .withColumn("crk", row_number().over(cellW))
      .filter(col("crk") <= nProbe)
      .select(col("id").as("qid"), col("qvec").as("q_qvec"),
        col("norm_sq").as("q_norm"), col("cell"))
    val joined = queries.join(corpus, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine", dotQ(col("q_qvec"), col("c_qvec")).cast("double") /
        sqrt(col("q_norm").cast("double") * col("c_norm").cast("double")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("cid").as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  /** Product-quantization ANN top-k (PQ + asymmetric distance
    * computation): each vector is stored as `m` one-byte codes — the
    * nearest codebook centroid per `dims/m`-wide subspace — and queries
    * rank candidates by the ADC dot product: the sum over subspaces of
    * (query subvector · the candidate's assigned centroid). The 100 TB
    * memory play BEYOND [[int8Codes]]' 4×: at m=8 codes per 64-dim
    * vector the corpus residency drops 64× vs float32 (codes + one
    * shared codebook), which is how billion-vector indexes fit executor
    * memory at all; recall < 1 by construction — measure with the
    * [[recallAtK]] join shape before committing m/nCent at scale.
    *
    * Like [[ivfSeededTopK]], the codebook is the DETERMINISTIC
    * md5-ranked sample (subspace j's centroids = the sample vectors'
    * j-th subvectors, no Lloyd iterations), so encoding and ADC scoring
    * are exact BIGINT arithmetic end-to-end and the whole pipeline is
    * oracle-checkable. Scale shape: one broadcast of the nCent-row
    * codebook for encoding (min-struct aggregate, map-side combined —
    * 1× corpus exchange), one broadcast of the per-query LUT
    * (nCent × m partial dots) against the coded corpus, one per-query
    * window. No self-join, no collect.
    */
  def pqTopK(prepared: DataFrame, queryPred: Column, m: Int = 8,
      nCent: Int = 8, k: Int = 5, dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dims % m == 0, s"dims=$dims must split into m=$m subspaces")
    val sub = dims / m
    val seedW = Window.orderBy(col("h"), col("seed_id"))
    val seeds = prepared
      .select(col("id").as("seed_id"), col("qvec").as("seed_qvec"),
        md5(col("id").cast("string")).as("h"))
      .orderBy(col("h"), col("seed_id")).limit(nCent)
      .withColumn("cent", row_number().over(seedW).cast("long"))
      .drop("h")
    def subv(c: Column, j: Int) = slice(c, j * sub + 1, sub)
    // encode: nCent rows per vector, m (d2, cent) structs per row; the
    // per-subspace argmin is a min-struct aggregate (map-side combine
    // collapses the nCent expansion before the exchange — same shape as
    // ivfSeededTopK's assignment)
    val subCols = (0 until m).map { j =>
      val xj = subv(col("qvec"), j); val sj = subv(col("seed_qvec"), j)
      struct((dotQ(xj, xj) - lit(2L) * dotQ(xj, sj) + dotQ(sj, sj)).as("d2"),
        col("cent")).as(s"s$j")
    }
    // codes + the vector's EXACT norm (the standard PQ companion scalar:
    // 8 more bytes per vector, and ADC can rank by approximate COSINE —
    // raw ADC dot would let large-norm vectors dominate)
    val enc = prepared.select(col("id"), col("qvec"), col("norm_sq"))
      .crossJoin(broadcast(seeds))
      .select(col("id") +: col("norm_sq") +: subCols: _*)
      .groupBy(col("id"), col("norm_sq"))
      .agg(min(col("s0")).as("m0"),
        (1 until m).map(j => min(col(s"s$j")).as(s"m$j")): _*)
      .select(col("id").as("cid"), col("norm_sq").as("c_norm"),
        array((0 until m).map(j => col(s"m$j.cent")): _*).as("codes"))
    // per-query LUT: lut[cent][j] = query-subvector-j · centroid-cent-j
    val qlut = prepared.filter(queryPred)
      .select(col("id").as("qid"), col("qvec"), col("norm_sq").as("q_norm"))
      .crossJoin(broadcast(seeds))
      .select(col("qid"), col("q_norm"), col("cent"), array((0 until m).map(j =>
        dotQ(subv(col("qvec"), j), subv(col("seed_qvec"), j))): _*).as("pds"))
      .groupBy(col("qid"), col("q_norm"))
      .agg(transform(array_sort(collect_list(struct(col("cent"), col("pds")))),
        s => s.getField("pds")).as("lut"))
    val adc = (0 until m).map(j =>
      element_at(element_at(col("lut"),
        element_at(col("codes"), j + 1).cast("int")), j + 1))
      .reduce(_ + _)
    val joined = enc.crossJoin(broadcast(qlut))
      .filter(col("qid") =!= col("cid"))
      .withColumn("adc_dot", adc)
      // one IEEE division per pair, like every cosine in this family
      .withColumn("adc_cosine", col("adc_dot").cast("double") /
        sqrt(col("q_norm").cast("double") * col("c_norm").cast("double")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc_cosine").desc, col("cid"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("cid").as("neighbor_id"),
        col("adc_dot"), col("adc_cosine"), col("rank"))
  }

  /** The md5-ranked deterministic sample shared by the seeded coarse
    * quantizers: n corpus vectors with 1-based ranks in a column named
    * `rankCol` — a distributed top-n (TakeOrderedAndProject), then a
    * window over only those n rows.
    */
  private def seededSample(prepared: DataFrame, n: Int,
      rankCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    prepared
      .select(col("id").as("seed_id"), col("qvec").as("seed_qvec"),
        col("norm_sq").as("seed_norm"),
        md5(col("id").cast("string")).as("h"))
      .orderBy(col("h"), col("seed_id")).limit(n)
      .withColumn(rankCol, row_number()
        .over(Window.orderBy(col("h"), col("seed_id"))).cast("long"))
      .drop("h")
  }

  /** IVF×PQ index build — the production ANN pairing's OFFLINE step: each
    * vector's coarse cell ([[ivfSeededTopK]]'s quantizer over nCells
    * seeds) plus its PQ byte codes and exact norm ([[pqTopK]]'s encoding
    * over an nCent-centroid codebook). The output (cid, cell, c_norm,
    * codes) is the ENTIRE per-vector residency — ~(4 + 8 + m) bytes — and
    * is what a deployment materializes once (bucket it by `cell`) and
    * serves every query from; the float vectors are never read again on
    * the query path. Both assignments are the min-struct aggregate shape
    * (map-side combined, 1× corpus exchange each) joined on id.
    */
  def ivfPqIndex(prepared: DataFrame, nCells: Int, m: Int = 8,
      nCent: Int = 256, dims: Int = 64): DataFrame =
    ivfPqIndexFrom(prepared, seededSample(prepared, nCells, "cell"),
      seededSample(prepared, nCent, "cent"), m, dims)

  /** [[ivfPqIndex]] against EXPLICIT quantizer frames — the seam the
    * maintained-index lifecycle needs: a frozen quantizer
    * ([[saveIvfPqQuantizer]]) encodes every future ingest batch
    * identically, which is what keeps an incrementally-built index
    * valid (drifting seeds would silently re-cell the corpus).
    */
  private def ivfPqIndexFrom(prepared: DataFrame, cellSeeds: DataFrame,
      codebook: DataFrame, m: Int, dims: Int): DataFrame = {
    require(dims % m == 0, s"dims=$dims must split into m=$m subspaces")
    val sub = dims / m
    val cells = prepared.select(col("id"), col("qvec"), col("norm_sq"))
      .crossJoin(broadcast(cellSeeds))
      .withColumn("d2", col("norm_sq")
        - lit(2L) * dotQ(col("qvec"), col("seed_qvec")) + col("seed_norm"))
      .groupBy(col("id"))
      .agg(min(struct(col("d2"), col("cell"))).as("mc"))
      .select(col("id"), col("mc.cell").as("cell"))
    def subv(c: Column, j: Int) = slice(c, j * sub + 1, sub)
    val subCols = (0 until m).map { j =>
      val xj = subv(col("qvec"), j); val sj = subv(col("seed_qvec"), j)
      struct((dotQ(xj, xj) - lit(2L) * dotQ(xj, sj) + dotQ(sj, sj)).as("d2"),
        col("cent")).as(s"s$j")
    }
    val enc = prepared.select(col("id"), col("qvec"), col("norm_sq"))
      .crossJoin(broadcast(codebook))
      .select(col("id") +: col("norm_sq") +: subCols: _*)
      .groupBy(col("id"), col("norm_sq"))
      .agg(min(col("s0")).as("m0"),
        (1 until m).map(j => min(col(s"s$j")).as(s"m$j")): _*)
      .select(col("id"), col("norm_sq").as("c_norm"),
        array((0 until m).map(j => col(s"m$j.cent")): _*).as("codes"))
    enc.join(cells, Seq("id")).select(col("id").as("cid"), col("cell"),
      col("c_norm"), col("codes"))
  }

  /** IVF×PQ query — the production pairing ONLINE: probe the query's
    * nProbe nearest coarse cells, rank ONLY their members by
    * ADC-approximated cosine from the PQ codes. Per query the scan is
    * nProbe/nCells of the corpus and reads ~(4+8+m)-byte index rows, not
    * vectors — the shape that serves interactive ANN over a corpus whose
    * float form never fits. Pass a materialized [[ivfPqIndex]] to skip
    * the build; recall compounds both approximations (cells × codes) —
    * measure before committing the dials.
    */
  def ivfPqTopK(prepared: DataFrame, queryPred: Column, nCells: Int,
      nProbe: Int, m: Int = 8, nCent: Int = 256, k: Int = 5,
      dims: Int = 64, index: Option[DataFrame] = None): DataFrame = {
    // with a prebuilt index the call never reaches ivfPqIndex's check, and
    // a silently truncating `sub` would slice the query LUT at wrong
    // subvector boundaries — wrong ADC scores with no error
    require(dims % m == 0, s"dims=$dims must split into m=$m subspaces")
    val idx = index.getOrElse(ivfPqIndex(prepared, nCells, m, nCent, dims))
    ivfPqTopKFrom(prepared.filter(queryPred), idx,
      seededSample(prepared, nCells, "cell"),
      seededSample(prepared, nCent, "cent"), nProbe, m, k, dims)
  }

  /** The ONLINE probe against explicit quantizer frames + index — shared
    * by [[ivfPqTopK]] (seeds re-derived from the corpus) and
    * [[ivfPqServe]] (seeds loaded from the frozen saved quantizer).
    * `queries` must be prepare()-shaped rows (id, qvec, norm_sq).
    */
  private def ivfPqTopKFrom(queries: DataFrame, idx: DataFrame,
      cellSeeds: DataFrame, codebook: DataFrame, nProbe: Int, m: Int,
      k: Int, dims: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dims % m == 0, s"dims=$dims must split into m=$m subspaces")
    val sub = dims / m
    def subv(c: Column, j: Int) = slice(c, j * sub + 1, sub)
    val qs = queries
      .select(col("id").as("qid"), col("qvec"), col("norm_sq").as("q_norm"))
    val probes = qs.crossJoin(broadcast(cellSeeds))
      .withColumn("d2", col("q_norm")
        - lit(2L) * dotQ(col("qvec"), col("seed_qvec")) + col("seed_norm"))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("d2"), col("cell"))))
      .filter(col("crk") <= nProbe)
      .select(col("qid"), col("cell"))
    val qlut = qs.crossJoin(broadcast(codebook))
      .select(col("qid"), col("q_norm"), col("cent"),
        array((0 until m).map(j =>
          dotQ(subv(col("qvec"), j), subv(col("seed_qvec"), j))): _*).as("pds"))
      .groupBy(col("qid"), col("q_norm"))
      .agg(transform(array_sort(collect_list(struct(col("cent"), col("pds")))),
        s => s.getField("pds")).as("lut"))
    val adc = (0 until m).map(j =>
      element_at(element_at(col("lut"),
        element_at(col("codes"), j + 1).cast("int")), j + 1))
      .reduce(_ + _)
    // the index is the ONLY big side here (queries-per-batch is small by
    // the serve contract): broadcast the probe×LUT frame so the index —
    // inline or a materialized cell-bucketed table — is always the
    // streamed side and never exchanges on the probe join (ScaleSpec
    // pins the plan over a bucketBy(cell) saved index)
    val joined = idx.join(broadcast(probes.join(broadcast(qlut), Seq("qid"))),
        Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("adc_dot", adc)
      .withColumn("adc_cosine", col("adc_dot").cast("double") /
        sqrt(col("q_norm").cast("double") * col("c_norm").cast("double")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc_cosine").desc, col("cid"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("cid").as("neighbor_id"),
        col("adc_dot"), col("adc_cosine"), col("rank"))
  }

  /** Per-vector coarse cell under the seeded deterministic quantizer —
    * the IVF assignment step alone (broadcast seeds, min-struct argmin,
    * map-side combined, 1× corpus exchange), exposed for operators that
    * use cells as a BLOCKING structure rather than a search index.
    */
  def seededCells(prepared: DataFrame, nCells: Int): DataFrame = {
    val seeds = seededSample(prepared, nCells, "cell")
    prepared.select(col("id"), col("qvec"), col("norm_sq"))
      .crossJoin(broadcast(seeds))
      .withColumn("d2", col("norm_sq")
        - lit(2L) * dotQ(col("qvec"), col("seed_qvec")) + col("seed_norm"))
      .groupBy(col("id"))
      .agg(min(struct(col("d2"), col("cell"))).as("mc"))
      .select(col("id"), col("mc.cell").as("cell"))
  }

  /** SEMANTIC deduplication (the SemDeDup recipe, Abbas et al. 2023,
    * arXiv:2303.09540): cluster embeddings with a cheap coarse
    * quantizer, compare pairs ONLY within a cluster by exact cosine,
    * and keep one representative (largest norm, tie on id) per
    * connected group of near-duplicates. Returns one row per corpus
    * vector: (vec_id, cluster — the near-dup group's min id, own id
    * when untouched —, keep 1|0).
    *
    * Scale shape: the cells are the blocking structure — within-cell
    * all-pairs is n²/C per cell (size C so a cell's pair block fits an
    * executor; the standard SemDeDup compromise), seeds broadcast,
    * components by iterative min-label propagation, survivors one
    * window over pair-members only. Everything is BIGINT-exact under
    * the seeded quantizer, so the whole pipeline — cells, pairs,
    * transitive closure, survivor ranks — is DuckDB-oracle-checkable.
    *
    * HOT-CELL GUARD: a global cell count C cannot bound ONE skewed cell
    * — and SemDeDup runs precisely on corpora with dense near-dup
    * clusters, where the densest cluster lands one task with its entire
    * n² pair block (the straggler that kills the stage at 100×). Cells
    * larger than `maxCellSize` are therefore deterministically
    * sub-split before pairing: nsub = ⌈size/maxCellSize⌉ sub-cells by
    * the portable 48-bit md5 hash of the id, pairs compared only within
    * a (cell, sub) block. Pairs ACROSS sub-cells of a split cell are
    * not compared — the same nature of approximation as the cell
    * blocking itself, now with a bounded per-task pair budget; the
    * md5 sub-split is oracle-reproducible, so the capped operator stays
    * hash-checkable end to end.
    */
  def semanticDedup(prepared: DataFrame, nCells: Int,
      threshold: Double, maxCellSize: Int = Int.MaxValue): DataFrame = {
    val b0 = prepared.select(col("id"), col("qvec"), col("norm_sq"))
      .join(seededCells(prepared, nCells), "id")
    val b =
      if (maxCellSize == Int.MaxValue) b0.withColumn("sub", lit(0L))
      else {
        // per-cell sizes: ≤ nCells rows, broadcast to the pair join
        val sizes = b0.groupBy(col("cell")).agg(count(lit(1)).as("cn"))
          .withColumn("nsub",
            expr(s"(cn + ${maxCellSize - 1}) div $maxCellSize"))
          .select(col("cell"), col("nsub"))
        b0.join(broadcast(sizes), "cell")
          .withColumn("sub",
            TextAnalysis.hash48(col("id").cast("string")) % col("nsub"))
          .drop("nsub")
      }
    val pairs = b.as("a").join(b.as("c"),
        col("a.cell") === col("c.cell") && col("a.sub") === col("c.sub") &&
          col("a.id") < col("c.id"))
      .withColumn("cosine", dotQ(col("a.qvec"), col("c.qvec")).cast("double") /
        sqrt(col("a.norm_sq").cast("double") * col("c.norm_sq").cast("double")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("c.id").as("id_b"))
    val comp = Dedup.components(pairs)
    val surv = Dedup.survivorsBy(comp,
      prepared.select(col("id").as("vec_id"), col("norm_sq")),
      "vec_id", col("norm_sq"))
      .select(col("cluster"), col("survivor"))
    prepared.select(col("id").as("vec_id"))
      .join(comp.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .join(surv, Seq("cluster"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster"), col("vec_id")).as("cluster"),
        when(col("survivor").isNull || col("survivor") === col("vec_id"), 1L)
          .otherwise(0L).as("keep"))
  }

  // ---------- maintained ANN index lifecycle (freeze → stream → serve) ----

  /** Freeze the IVF×PQ quantizer: persist the seeded cell seeds and PQ
    * codebook (plus m/dims/nCells/nCent as table properties) so every
    * FUTURE ingest batch encodes identically — the precondition for an
    * incrementally-maintained index (re-deriving seeds from a grown
    * corpus would silently re-cell and re-code everything already
    * indexed). Tiny tables: nCells + nCent rows total.
    */
  def saveIvfPqQuantizer(spark: SparkSession, prepared: DataFrame,
      name: String, nCells: Int, m: Int = 8, nCent: Int = 256,
      dims: Int = 64): Unit = {
    require(dims % m == 0, s"dims=$dims must split into m=$m subspaces")
    seededSample(prepared, nCells, "cell")
      .write.mode("overwrite").saveAsTable(s"${name}_cells")
    seededSample(prepared, nCent, "cent")
      .write.mode("overwrite").saveAsTable(s"${name}_codebook")
    spark.sql(s"ALTER TABLE ${name}_cells SET TBLPROPERTIES (" +
      s"'graft.ivfpq.m'='$m', 'graft.ivfpq.dims'='$dims', " +
      s"'graft.ivfpq.ncells'='$nCells', 'graft.ivfpq.ncent'='$nCent')")
    ()
  }

  private def quantizerParams(spark: SparkSession, name: String): (Int, Int) = {
    val props = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(s"${name}_cells"))
      .properties
    (props("graft.ivfpq.m").toInt, props("graft.ivfpq.dims").toInt)
  }

  /** Encode prepare()-shaped vectors against the FROZEN quantizer —
    * (cid, cell, c_norm, codes) index rows, broadcast-seed shapes
    * identical to the inline build.
    */
  def ivfPqEncodeWith(spark: SparkSession, prepared: DataFrame,
      name: String): DataFrame = {
    val (m, dims) = quantizerParams(spark, name)
    ivfPqIndexFrom(prepared, spark.table(s"${name}_cells"),
      spark.table(s"${name}_codebook"), m, dims)
  }

  /** STREAMING maintenance of the cell-bucketed IVF×PQ index: each
    * micro-batch of vectors is encoded under the frozen quantizer and
    * lands as its own `ingest_batch` partition of the bucketed layout —
    * the dedup index's replay-idempotent drop+append loop
    * ([[DedupIndex.landBatch]]) with `cell` as the bucket column, so
    * the probe join's zero-index-side-exchange property holds on the
    * MAINTAINED table too. Compact with [[compactIvfPqIndex]] (the same
    * size-tiered, manifest-crash-safe, fingerprint-guarded machinery).
    */
  // ------------------------------------------ maintained k-means

  /** Land one micro-batch's centroid DELTAS — the batch's vectors routed
    * against the FROZEN `base` centroids, reduced to exact per-cid
    * (count, per-dimension sum) integers — into `table`, partition
    * `ingest_batch = batchId`, via the same idempotent
    * drop-partition+append protocol every maintained index uses
    * ([[DedupIndex.landBatch]]): a restart-replayed batch id lands
    * exactly once. Routing against the frozen base (never the drifted
    * version) is the EXACTNESS key: summed deltas are then
    * order-independent, so the fold over any batch decomposition of the
    * data equals ONE batch Lloyd iteration from `base` bit-for-bit.
    * The delta table is never compacted — it holds k·dims rows per
    * batch, so folding buys nothing and the per-batch partitions are
    * themselves the version history [[centroidDrift]] reads.
    * private[graft] so specs can drive the replay path directly.
    */
  private[graft] def landCentroidDeltas(s: SparkSession,
      outer: SparkSession, prepared: DataFrame,
      base: Array[(Int, Long, Array[Long], Long)], table: String,
      batchId: Long): Unit = {
    val deltas = routeToCentroids(prepared, base)
      .select(col("cid"), posexplode(col("qvec")).as(Seq("j", "qj")))
      .groupBy(col("cid"), col("j"))
      .agg(sum(col("qj")).as("sj"), count(lit(1)).as("cnt"))
      .groupBy(col("cid"))
      .agg(max(col("cnt")).as("dn"),
        transform(array_sort(collect_list(struct(col("j"), col("sj")))),
          x => x.getField("sj")).as("dsv"))
      .withColumn("ingest_batch", lit(batchId))
    DedupIndex.landBatch(s, outer, deltas, table, batchId,
      bucketed = false, buckets = 1)
  }

  /** MAINTAINED k-means — mini-batch centroid updates over a stream (the
    * missing half of [[routeToCentroids]]'s frozen-quantizer story: real
    * ingest drifts, so the quantizer must follow). Per micro-batch the
    * arrivals are routed against the frozen `base` and their exact
    * (n, Σ)-deltas land as a centroid VERSION increment
    * ([[landCentroidDeltas]]); [[centroidsAt]] folds any prefix of the
    * landed batches into that version's centroids and
    * [[centroidDrift]] reports the per-cid shift each batch caused.
    *
    * Scale shape: the corpus-sized work (route + per-(cid,dim)
    * aggregation, map-side combinable) happens once per batch inside
    * the stream; everything downstream — versions, drift — reads only
    * the delta table, which is k·dims rows PER BATCH regardless of
    * corpus size.
    */
  def startCentroidMaintenance(spark: SparkSession, vecs: DataFrame,
      idCol: String, vecCol: String,
      base: Array[(Int, Long, Array[Long], Long)],
      table: String, checkpointPath: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val prep = prepare(batch.toDF()
          .withColumnRenamed(idCol, "id"), vecCol)
        landCentroidDeltas(s, spark, prep, base, table, batchId)
      }.start()

  /** The centroid VERSION after folding every landed delta batch with
    * id ≤ `upTo` (None = all): per cid, n = Σ counts, sv = elementwise
    * Σ sums, ss recomputed from the folded sv; a cid no streamed vector
    * has reached keeps its `base` centroid — exactly Lloyd's
    * empty-cluster rule, so the all-batches version IS
    * `update(assign(data, base), base)`: one batch Lloyd iteration,
    * bit-for-bit (the l138 gate pins this against the relational
    * replay). The collect is k-row bounded — the returned array is the
    * next epoch's frozen quantizer.
    */
  def centroidsAt(spark: SparkSession, table: String,
      base: Array[(Int, Long, Array[Long], Long)],
      upTo: Option[Long] = None): Array[(Int, Long, Array[Long], Long)] = {
    if (!spark.catalog.tableExists(table)) return base
    val d0 = spark.table(table)
    val d = upTo.map(b => d0.filter(col("ingest_batch") <= b)).getOrElse(d0)
    val folded = d
      .select(col("cid"), col("dn"), posexplode(col("dsv")).as(Seq("j", "dsj")))
      .groupBy(col("cid"), col("j"))
      .agg(sum(col("dsj")).as("sj"), sum(col("dn")).as("cn"))
      .groupBy(col("cid"))
      .agg(max(col("cn")).as("n"),
        transform(array_sort(collect_list(struct(col("j"), col("sj")))),
          x => x.getField("sj")).as("sv"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getSeq[Long](2).toArray)))
      .toMap
    base.map { case (cid, n0, sv0, ss0) =>
      folded.get(cid).map { case (n, sv) =>
        (cid, n, sv, sv.map(v => v * v).sum)
      }.getOrElse((cid, n0, sv0, ss0))
    }
  }

  /** Per-(batch, cid) DRIFT report — how far each landed batch moved
    * each centroid: between consecutive versions v_prev = (n_p, sv_p)
    * and v_cur = (n_c, sv_c) (positions sv/n), the exact integer L1
    * shift numerator Σ_j |sv_c_j·n_p − sv_p_j·n_c| over the common
    * denominator `denom` = n_p·n_c (also returned; consumers divide
    * once, or rank by the pair — within one cid the ranking is exact).
    * A cid's first landed batch shifts relative to its `base` centroid.
    * Reads ONLY the delta table (k·dims rows per batch): cumulative
    * window sums per (cid, dim), one lag, one re-aggregation — corpus
    * size never appears. Products are exact while Σ|q| per centroid ×
    * member count stays under 2^63 (quantized 1e4-scale unit vectors:
    * safe past 10⁷ members per cid per maintained epoch; beyond that,
    * re-freeze the base more often — the report is per-epoch by
    * construction).
    */
  def centroidDrift(spark: SparkSession, table: String,
      base: Array[(Int, Long, Array[Long], Long)]): DataFrame = {
    import spark.implicits._
    val baseE = base.toSeq.flatMap { case (cid, n0, sv0, _) =>
      sv0.zipWithIndex.map { case (v, j) => (cid, j, n0, v) }
    }.toDF("cid", "j", "n0", "sv0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid"), col("j")).orderBy(col("ingest_batch"))
    spark.table(table)
      .select(col("ingest_batch"), col("cid"), col("dn"),
        posexplode(col("dsv")).as(Seq("j", "dsj")))
      .withColumn("csj", sum(col("dsj")).over(w))
      .withColumn("cn", sum(col("dn")).over(w))
      .withColumn("sjp", lag(col("csj"), 1).over(w))
      .withColumn("cnp", lag(col("cn"), 1).over(w))
      .join(broadcast(baseE), Seq("cid", "j"))
      .withColumn("sj_prev", coalesce(col("sjp"), col("sv0")))
      .withColumn("n_prev", coalesce(col("cnp"), col("n0")))
      .groupBy(col("ingest_batch"), col("cid"))
      .agg(max(col("n_prev")).as("n_prev"), max(col("cn")).as("n_cur"),
        sum(abs(col("csj") * col("n_prev") - col("sj_prev") * col("cn")))
          .as("shift_l1_num"))
      .withColumn("denom", col("n_prev") * col("n_cur"))
  }

  def startIvfPqMaintenance(spark: SparkSession, vecs: DataFrame,
      idCol: String, vecCol: String, name: String, checkpointPath: String,
      buckets: Int = 8,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val prep = prepare(batch.toDF()
          .withColumnRenamed(idCol, "id"), vecCol)
        val enc = ivfPqEncodeWith(s, prep, name)
          .withColumn("ingest_batch", lit(batchId))
        DedupIndex.landBatch(s, spark, enc, name, batchId,
          bucketed = true, buckets, bucketCol = "cell")
      }.start()

  /** Size-tiered compaction of the maintained ANN index — identical
    * lifecycle guarantees to [[DedupIndex.compact]] (no fold rewritten
    * beside fresh arrivals, manifest crash recovery, folded-batch
    * replay skip), over the `cell` bucket column.
    */
  def compactIvfPqIndex(spark: SparkSession, name: String,
      buckets: Int = 8, tierFanout: Int = 8): Unit =
    DedupIndex.compactTable(spark, name, bucketed = true, "cell",
      buckets, tierFanout)

  /** Serve ANN queries from the MAINTAINED index: probes and LUTs from
    * the frozen quantizer, candidates from the bucketed table, the
    * probe side broadcast — the index never exchanges, vectors are
    * never read. `queries` must be prepare()-shaped (id, qvec,
    * norm_sq) — query-side quantization is per-vector and thus
    * corpus-independent, so fresh queries encode consistently with the
    * frozen corpus codes.
    */
  def ivfPqServe(spark: SparkSession, name: String, queries: DataFrame,
      nProbe: Int, k: Int = 5): DataFrame = {
    val (m, dims) = quantizerParams(spark, name)
    val idx0 = spark.table(name).drop("ingest_batch")
    // takedowns ([[retractVectors]]) are logical: the tombstone set
    // broadcasts into an anti-join on the serve path, so the index-side
    // zero-exchange property survives and the bucketed layout is never
    // rewritten per removal request
    val idx =
      if (spark.catalog.tableExists(s"${name}_tombstones"))
        idx0.join(broadcast(spark.table(s"${name}_tombstones")
          .select(col("id").as("cid"))), Seq("cid"), "left_anti")
      else idx0
    ivfPqTopKFrom(queries, idx,
      spark.table(s"${name}_cells"), spark.table(s"${name}_codebook"),
      nProbe, m, k, dims)
  }

  /** TAKEDOWN for the maintained ANN index: removal requests land as
    * tombstones (the [[DedupIndex.landBatch]] idempotent partition
    * protocol — one partition per opId, replay-safe) and [[ivfPqServe]]
    * anti-joins them at serve time. Deletion is logical immediately —
    * no rewrite of the cell-bucketed layout per request — and becomes
    * physical whenever [[compactIvfPqIndex]]-era maintenance rebuilds
    * the touched partitions. The frozen quantizer is untouched: seeds
    * derived from since-removed vectors remain valid cell centers (a
    * center is a coordinate, not a document).
    */
  def retractVectors(spark: SparkSession, name: String,
      removeIds: DataFrame, opId: Long, buckets: Int = 8): Unit =
    DedupIndex.landBatch(spark, spark,
      removeIds.select(col("id")).withColumn("ingest_batch", lit(opId)),
      s"${name}_tombstones", opId, bucketed = false, buckets)

  /** All near-duplicate pairs with cosine >= threshold, via sign-LSH
    * bucketing (near-identical vectors agree on sign buckets with high
    * probability; exact near-dup pairs additionally verified by the exact
    * integer cosine).
    */
  def cosineNearDupPairs(prepared: DataFrame, threshold: Double, bits: Int = 8): DataFrame = {
    val bucketed = prepared.withColumn("bucket", signBucket(col("embedding"), bits))
    bucketed.alias("q").join(bucketed.alias("c"),
        col("q.bucket") === col("c.bucket") && col("q.id") < col("c.id"))
      .withColumn("dot", dotQ(col("q.qvec"), col("c.qvec")))
      .withColumn("cosine", pairCosine)
      .filter(col("cosine") >= threshold)
      .select(col("q.id").as("id_a"), col("c.id").as("id_b"), col("cosine"))
  }

  /** Per-query recall@k of the rp-LSH bucketed path against brute-force
    * ground truth — the evaluation harness that tunes the ANN dials
    * (bits/nProbe) before committing them at scale. Ground truth is
    * computed over the SAMPLED query set only (recall estimation by query
    * sampling — the corpus side stays a bucketed join, never n² over the
    * full corpus). Every compared column is an exact BIGINT count; recall
    * is integer percent via truncating division, so the result is
    * engine-reproducible end to end.
    */
  def recallAtK(prepared: DataFrame, queryPred: Column, bits: Int,
      k: Int, dims: Int = 64): DataFrame =
    recallVs(bruteForceTopK(prepared, prepared.filter(queryPred), k),
      rpBucketedTopK(prepared, queryPred, bits, k, dims))

  /** Per-query recall of ANY approximate top-k frame against a truth
    * frame (both shaped (query_id, neighbor_id, …)) — the same
    * BIGINT-exact measurement [[recallAtK]] applies to rp-LSH, usable for
    * every strategy in this family (sign-LSH, multi-probe, IVF, int8, PQ,
    * IVF×PQ): truth left-joins the approximate set, hits and recall_pct
    * are exact integers, so a tuning sweep's numbers are reproducible
    * across engines and cluster sizes.
    */
  def recallVs(truth: DataFrame, approx: DataFrame): DataFrame =
    truth.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id"),
        lit(1L).as("hit")), Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_truth"), count(col("hit")).as("hits"))
      .withColumn("recall_pct", expr("(hits * CAST(100 AS BIGINT)) div n_truth"))

  /** Int8 scalar quantization of a prepared (1e-4-unit BIGINT) vector:
    * per-vector symmetric scale code_i = round(q_i * 127 / max|q|),
    * half-away-from-zero, clipped to [-127, 127] by construction. The
    * 100 TB rationale: an int8 code array is 4x smaller than float32 (16x
    * smaller than the BIGINT working form), turning an embedding store
    * that spills into one that fits executor memory; the scale factor
    * max|q| stays alongside for reconstruction. All-zero vectors code to
    * all zeros (guarded — no 0/0). One double multiply+divide per element
    * with floor/ceil rounding: deterministic IEEE ops, engine-portable
    * like [[quantize]].
    */
  def int8Codes(qvec: Column): Column = {
    val maxabs = array_max(transform(qvec, x => abs(x)))
    transform(qvec, x => {
      val d = x.cast("double") * 127.0 / maxabs.cast("double")
      when(maxabs === 0L, lit(0L))
        .when(x >= 0L, floor(d + 0.5).cast("long"))
        .otherwise(ceil(d - 0.5).cast("long"))
    })
  }

  /** Brute-force top-k in the int8 code domain: ranking cosine is computed
    * from exact BIGINT code dots/norms (one double division at the end,
    * as everywhere in this family). `code_dot` is emitted as the exact
    * integer score. Recall vs full-precision is < 1 by construction —
    * that is the memory trade; measure it with [[recallAtK]]-style joins
    * before committing the code path at scale.
    */
  def int8TopK(prepared: DataFrame, queryPred: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coded = prepared
      .withColumn("c8", int8Codes(col("qvec")))
      .withColumn("c8_norm", dotQ(col("c8"), col("c8")))
    val queries = coded.filter(queryPred)
    val joined = queries.alias("q")
      .join(coded.alias("c"), col("q.id") =!= col("c.id"))
      .withColumn("code_dot", dotQ(col("q.c8"), col("c.c8")))
      .withColumn("code_cosine", col("code_dot").cast("double") /
        sqrt(col("q.c8_norm").cast("double") * col("c.c8_norm").cast("double")))
    val w = Window.partitionBy(col("q.id"))
      .orderBy(col("code_cosine").desc, col("c.id"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        col("code_dot"), col("rank"))
  }
}
