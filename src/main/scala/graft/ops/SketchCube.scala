package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count cube: the "compute once, roll up forever"
  * pre-aggregation pattern for 100 TB facts.
  *
  * A cardinality question (`distinct keys per <any dim subset>`) normally
  * costs a full fact scan per question because COUNT(DISTINCT) is not
  * additive. The cube fixes the cost at ONE scan total: aggregate the fact
  * once at the finest useful grain into an HLL sketch per slice
  * (Datasketches HLL via Spark's codegen'd `hll_sketch_agg`), then answer
  * every coarser rollup by unioning sketches — register-wise max, so the
  * union over any slice partition is EXACTLY the sketch of the union of
  * their key sets (associative, commutative, idempotent). New data merges
  * in the same way: sketch the increment, union into the cube — no rescan
  * of history, the same landing discipline as [[DedupIndex]].
  *
  * Scale shape: the fact scan partial-aggregates map-side (one sketch per
  * task per live slice, merged in the single slice-keyed shuffle); every
  * question after that reads only the cube — #slices rows of ~2^lgK bytes,
  * broadcastable. Exact additive measures (row counts here) ride along in
  * the same pass.
  *
  * Determinism: Datasketches HLL hashing is seed-fixed and register union
  * is order-independent, so estimates are bit-stable across partitionings
  * and retries — safe to gate with the q23-style accuracy-band contract
  * (lgK = 14 → RSE ≈ 0.8%, a 5% band is a firm bound, not a coin flip).
  *
  * Reference scope: the reference engine has no sketch module; this is the
  * training-data/OLAP surface (per-source distinct-doc tracking, URL
  * cardinality per crawl, token-vocab growth curves) at cube cost.
  */
object SketchCube {

  val DefaultLgK = 14

  /** One pass over the fact: fine-grain slices with the distinct-key
    * sketch plus exact additive measures — `(dims..., key_sketch, n_rows)`.
    */
  def build(fact: DataFrame, dims: Seq[String], keyCol: String,
      lgK: Int = DefaultLgK): DataFrame =
    fact.groupBy(dims.map(col): _*)
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("key_sketch"),
        count(lit(1)).as("n_rows"))

  /** Roll the cube up to a coarser dim subset (possibly empty = grand
    * total): sketches union register-wise, exact measures add. Touches
    * only the cube, never the fact.
    */
  def rollup(cube: DataFrame, dims: Seq[String]): DataFrame = {
    val g = cube.groupBy(dims.map(col): _*)
      .agg(hll_union_agg(col("key_sketch")).as("key_sketch"),
        sum(col("n_rows")).as("n_rows"))
    g
  }

  /** Merge an increment cube into a base cube (same grain): the landing
    * step for new data — union sketches, add counts, slice-keyed only.
    */
  def merge(base: DataFrame, increment: DataFrame, dims: Seq[String]): DataFrame =
    rollup(base.unionByName(increment), dims)

  /** Read the estimates off a cube/rollup frame. */
  def estimate(cube: DataFrame): DataFrame =
    cube.withColumn("distinct_est",
      hll_sketch_estimate(col("key_sketch")).cast("bigint"))

  /** Distinct-key overlap of two slices by inclusion–exclusion over the
    * cube's sketches: `|A∩B| ≈ est(A) + est(B) − est(A∪B)` — the
    * join-cardinality estimate (will this key join prune or explode?)
    * answered in ONE pass over the cube (three conditional register
    * unions), with the fact never re-scanned. Caveat, documented where
    * it bites: the error is HLL RSE relative to the UNION, not the
    * intersection — trustworthy when the overlap is a non-trivial
    * fraction of the union, useless for near-disjoint slices.
    */
  def overlapEstimate(cube: DataFrame, sliceCol: String,
      a: String, b: String): DataFrame =
    cube.agg(
      hll_sketch_estimate(hll_union_agg(
        when(col(sliceCol) === a, col("key_sketch"))))
        .cast("bigint").as("est_a"),
      hll_sketch_estimate(hll_union_agg(
        when(col(sliceCol) === b, col("key_sketch"))))
        .cast("bigint").as("est_b"),
      hll_sketch_estimate(hll_union_agg(
        when(col(sliceCol).isin(a, b), col("key_sketch"))))
        .cast("bigint").as("est_union"))
      .select(lit(a).as("slice_a"), lit(b).as("slice_b"),
        col("est_a"), col("est_b"), col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("overlap_est"))

  // ---------- maintained lifecycle (the no-rescan landing loop) ----------

  /** STREAMING maintenance of the cube: each micro-batch is pre-aggregated
    * to its own fine-grain cube (≤ #slices rows however large the batch)
    * and lands as an `ingest_batch` partition through the dedup index's
    * replay-idempotent drop+append protocol — the cardinality-tracking
    * twin of [[graft.ops.Retrieval.startBm25Maintenance]]. Serve-time
    * results are independent of how many batches have landed or folded:
    * HLL register union is associative/commutative/idempotent, so
    * [[serve]] over any partition state is bit-identical to the inline
    * build over the same rows.
    */
  def startMaintenance(spark: SparkSession, fact: DataFrame,
      dims: Seq[String], keyCol: String, name: String,
      checkpointPath: String, lgK: Int = DefaultLgK,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    fact.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val cube = build(batch.toDF(), dims, keyCol, lgK)
          .withColumn("ingest_batch", lit(batchId))
        DedupIndex.landBatch(s, spark, cube, name, batchId,
          bucketed = false, buckets = 8)
      }.start()

  /** Size-tiered compaction of the maintained cube — the same manifest-
    * crash-safe, fingerprint-guarded fold lifecycle as every maintained
    * index, PLUS row compression: the fold's `foldAgg` is the cube
    * rollup itself (sketch register-union per slice), so a fold of M
    * batch partials is ≤ #slices rows, not M × #slices. Compression is
    * semantically invisible (union associativity) — a crash-recovered
    * fold that ran without it serves identical results.
    */
  def compactMaintained(spark: SparkSession, name: String,
      dims: Seq[String], tierFanout: Int = 8): Unit =
    DedupIndex.compactTable(spark, name, bucketed = false,
      bucketCol = "bucket_unused", buckets = 8, tierFanout,
      foldAgg = df => rollup(df, dims))

  /** Estimates off the maintained cube at any rollup grain — reads only
    * the cube table, never the fact stream's data.
    */
  def serve(spark: SparkSession, name: String, dims: Seq[String]): DataFrame =
    estimate(rollup(spark.table(name).drop("ingest_batch"), dims))
}
