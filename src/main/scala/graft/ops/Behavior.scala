package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Behavioral analytics over event streams: ordered funnels and cohort
  * retention — the product-analytics query class, shaped for one event
  * scan each.
  *
  * Scale shape: both operators shuffle the events ONCE on the entity key
  * (the window partition); everything downstream (per-entity flags, the
  * final stage/cohort rollup) partial-aggregates map-side. No self-joins,
  * no per-stage re-scans — the textbook funnel-as-N-joins plan rescans
  * the events table once per stage and is quadratic in stages; the
  * running-min formulation here is one pass however many stages.
  */
object Behavior {

  /** Ordered funnel: for each entity, stage k is reached when an event of
    * `stages(k)` occurs AT OR AFTER the first time stage k−1 was reached
    * (strictly ordered by (tsCol, tieCol) — deterministic under ties).
    * Returns one row per stage: `(stage, stage_name, n_entities,
    * conversion_ppm)` with conversion relative to stage 1.
    *
    * One window over (entity, time) computes a running first-reach
    * timestamp per stage — running mins compose: an event qualifies for
    * stage k exactly when the stage-(k−1) running reach is already set —
    * then one aggregation rolls entities up to stages.
    */
  /** Per-entity first-reach timestamp of each funnel stage:
    * `(entity, t0, t1, …)` — tK is null until stage K has been reached
    * IN ORDER. The building block [[funnel]] aggregates and
    * time-to-convert analyses subtract.
    */
  /** `maxGapSeconds > 0` adds a CONVERSION DEADLINE: stage k only counts
    * within that many seconds of stage k−1's first reach (the real
    * product-funnel contract — "purchased within 24h of viewing").
    */
  def stageTimes(events: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, tieCol: String, stages: Seq[String],
      maxGapSeconds: Long = 0L): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    require(stages.distinct == stages,
      s"funnel stages must be distinct (got $stages): with a repeated " +
        "adjacent stage name the running-min window would let ONE event " +
        "complete both copies (its own row already carries the previous " +
        "stage's reach), diverging from the streaming FunnelProcessor, " +
        "which advances at most one stage per event")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // reach(k) on each row = ts of the row completing stage k, null until
    // qualified; cum(k) = running min of reach(k) — set once stage k has
    // been reached at or before this row.
    // Pre-filter to the stage alphabet AT THE SCAN: non-stage events can
    // never qualify and contribute nothing to any running min, so this is
    // semantics-free — and at 100 TB the funnel alphabet is a handful of
    // types out of hundreds, shrinking the entity-window shuffle by that
    // factor (the SCALE.md mitigation, now built in). Entities with zero
    // stage events drop from the output (they hold no stage either way).
    var df = events.toDF().filter(col(typeCol).isin(stages: _*))
    var prevCum: Option[Column] = None
    stages.zipWithIndex.foreach { case (st, i) =>
      val qualified = prevCum match {
        case None => col(typeCol) === st
        case Some(_) =>
          val inOrder = col(typeCol) === st && col(s"__cum${i - 1}").isNotNull
          if (maxGapSeconds > 0)
            inOrder && unix_micros(col(tsCol)) -
              unix_micros(col(s"__cum${i - 1}")) <=
              lit(maxGapSeconds * 1000000L)
          else inOrder
      }
      df = df.withColumn(s"__reach$i", when(qualified, col(tsCol)))
      df = df.withColumn(s"__cum$i", min(col(s"__reach$i")).over(w))
      prevCum = Some(col(s"__cum$i"))
    }
    val firstReach = stages.indices.map(i =>
      min(col(s"__reach$i")).as(s"t$i"))
    df.groupBy(col(entityCol)).agg(firstReach.head, firstReach.tail: _*)
  }

  def funnel(events: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, tieCol: String, stages: Seq[String],
      maxGapSeconds: Long = 0L): DataFrame = {
    val perEntity = stageTimes(events, entityCol, typeCol, tsCol, tieCol,
      stages, maxGapSeconds)
    val sums = stages.indices.map(i =>
      sum(when(col(s"t$i").isNotNull, 1L).otherwise(0L)).as(s"n_$i"))
    val hits = perEntity.agg(sums.head, sums.tail: _*)
    val rows = stages.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1L).as("stage"), lit(st).as("stage_name"),
        col(s"n_$i").as("n_entities"),
        floor(col(s"n_$i").cast("decimal(20,0)") * 1000000 /
          greatest(col("n_0"), lit(1L))).cast("bigint").as("conversion_ppm"))
    }
    hits.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** RFM segmentation (recency / frequency / monetary) WITHOUT the
    * textbook global-sort NTILE: per-entity metrics are one aggregation
    * (entity-keyed shuffle), quartile THRESHOLDS come off a
    * [[HistogramCube]] per metric (deterministic ceil-rank interpolation,
    * three driver longs per metric — O(1), broadcast as literals), and
    * bins are plain comparisons — no single-partition window anywhere,
    * so the op survives a billion entities. Bins are ascending in the
    * metric (bin 4 = most recent-inactive / most frequent / highest
    * spend); returns `(r_bin, f_bin, m_bin, n_entities)` segment counts.
    *
    * Monetary values are clamped at zero before bucketing
    * ([[HistogramCube.build]]'s buckets are non-negative by contract);
    * net-refund entities land in the lowest spend bin. The output is ≤64
    * rows by construction (three 4-way bins), so it is materialized
    * through the cached per-entity aggregate — the events scan and
    * entity groupBy run exactly once, after which the cache is released;
    * callers get a driver-local DataFrame, never a recompute.
    */
  def rfmSegments(events: DataFrame, entityCol: String, tsCol: String,
      valueExpr: String): DataFrame = {
    val spark = events.sparkSession
    val maxTs = events.agg(max(col(tsCol)).cast("date").as("corpus_max"))
    val m = events.groupBy(col(entityCol))
      .agg(max(col(tsCol)).cast("date").as("last_d"),
        count(lit(1)).as("frequency"),
        greatest(lit(0L),
          expr(s"CAST(SUM(CAST($valueExpr AS DECIMAL(12,2))) * 100 AS BIGINT)"))
          .as("monetary_cents"))
      .crossJoin(broadcast(maxTs))
      .withColumn("recency_days",
        datediff(col("corpus_max"), col("last_d")).cast("long"))
    m.cache()
    def thresholds(c: String, w: Long): Map[Int, Long] =
      HistogramCube.quantiles(HistogramCube.build(m, Nil, col(c), w),
          Nil, w, Seq(25, 50, 75))
        .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    def bin(c: String, t: Map[Int, Long]): Column =
      lit(1L) + (col(c) > lit(t(25))).cast("long") +
        (col(c) > lit(t(50))).cast("long") +
        (col(c) > lit(t(75))).cast("long")
    val tr = thresholds("recency_days", 1L)
    val tf = thresholds("frequency", 1L)
    val tm = thresholds("monetary_cents", 1000L)
    val out = m.select(
        bin("recency_days", tr).as("r_bin"),
        bin("frequency", tf).as("f_bin"),
        bin("monetary_cents", tm).as("m_bin"))
      .groupBy(col("r_bin"), col("f_bin"), col("m_bin"))
      .agg(count(lit(1)).as("n_entities"))
    // ≤64 rows: materialize through the cache BEFORE releasing it, so the
    // entity aggregation is never recomputed at the caller's action time
    val rows = out.collect()
    val schema = out.schema
    m.unpersist(blocking = false)
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** The quartile-threshold CTE as DuckDB SQL — the same histogram
    * program [[HistogramCube.quantiles]] runs, emitted from one place so
    * the oracle can never drift from the operator.
    */
  def rfmThresholdSql(metricsCte: String, metricCol: String, w: Long): String =
    s"""(SELECT q_pct,
        CAST(bucket * $w + ((rk - (cum - n)) * $w) // n AS BIGINT) AS thr
      FROM (SELECT q_pct, bucket, n, cum,
          GREATEST((total * q_pct + 99) // 100, 1) AS rk
        FROM (SELECT bucket, n,
            SUM(n) OVER (ORDER BY bucket) AS cum, SUM(n) OVER () AS total
          FROM (SELECT ($metricCol // $w) AS bucket, COUNT(*) AS n
            FROM $metricsCte GROUP BY 1))
        CROSS JOIN (SELECT * FROM (VALUES (25), (50), (75)) v(q_pct)))
      WHERE cum - n < rk AND rk <= cum)"""

  /** Weekly cohort retention: entities are cohorted by the week of their
    * first event; `(cohort_week, week_offset, n_entities)` counts the
    * cohort's entities active (any event) `week_offset` weeks later.
    * Week arithmetic is date_trunc('week') + day-difference div 7 —
    * integer-exact and engine-portable.
    */
  def cohortRetention(events: DataFrame, entityCol: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
    val withCohort = events
      .withColumn("__cohort", date_trunc("week", min(col(tsCol)).over(w)))
      .withColumn("__week", date_trunc("week", col(tsCol)))
    withCohort
      .select(col(entityCol), col("__cohort").cast("date").as("cohort_week"),
        floor(datediff(col("__week"), col("__cohort")) / 7).cast("bigint")
          .as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(entityCol)).as("n_entities"))
  }
}
