package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Robust anomaly detection: median / MAD (median absolute deviation)
  * outlier flagging per key — the monitoring op a pipeline runs over its
  * own operational metrics (events per minute per type, bytes per batch
  * per source) where a mean/stddev z-score is itself wrecked by the
  * outliers it is looking for (one 100× spike drags the mean; the median
  * shrugs).
  *
  * Exactness: medians are ceil-rank order statistics ((n+1) div 2) over
  * integer values — deterministic and engine-portable, so the oracle is
  * an exact hash, unlike approximate-percentile sketches. Ties cost
  * nothing: row_number among equal values is arbitrary but the VALUE at
  * a given rank is the sorted multiset's, which is unique.
  *
  * Scale shape: two sort-windows partitioned by the key (value rank,
  * then deviation rank) + one broadcast join of the #keys-row median
  * frame — the metric series shuffles twice on the key, never globally.
  * Keys are metric names/types (small cardinality, high rows-per-key);
  * a skewed key is one sort partition, bounded by that key's own series
  * length.
  */
object Anomaly {

  /** Per-key robust stats + outlier count: `(keys..., n, med, mad,
    * n_outliers)` where an outlier has |v − med| > k·mad (all BIGINT).
    * With mad = 0 (over half the series identical) any deviation flags —
    * the conventional MAD-test degeneration, documented not hidden.
    */
  def madOutliers(series: DataFrame, keyCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    val keys = keyCols.map(col)
    val byKey = Window.partitionBy(keys: _*)
    def medianOf(df: DataFrame, v: String, out: String): DataFrame =
      df.withColumn("__rn", row_number().over(byKey.orderBy(col(v))))
        .withColumn("__n", count(lit(1)).over(byKey))
        .groupBy(keys: _*)
        .agg(max(when(col("__rn") * 2 === col("__n") + (col("__n") % 2),
          col(v))).as(out))
    val med = medianOf(series, valueCol, "med")
    val dev = series.join(broadcast(med), keyCols)
      .withColumn("__d", abs(col(valueCol) - col("med")))
    val mad = medianOf(dev, "__d", "mad")
    dev.join(broadcast(mad), keyCols)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med"), max(col("mad")).as("mad"),
        sum(when(col("__d") > lit(k.toLong) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }
}
