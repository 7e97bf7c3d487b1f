package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling: per-column quality statistics (null count, distinct
  * count, min/max) for a set of columns in ONE corpus pass — the
  * ingest-time audit a 100 TB table gets before anything trusts it.
  *
  * All statistics compute in a single aggregation (one job); the result is
  * one row per profiled column via an unpivot of the 1-row aggregate
  * (driver-free, the aggregate is a handful of cells). Values are
  * stringified AFTER the typed min/max so numeric ordering is preserved.
  *
  * Scale note: exact `countDistinct` on several columns expands the
  * aggregate (one pass per distinct set); at 100 TB swap
  * `approxDistinct = true` — approx_count_distinct is a single mergeable
  * sketch per column, same plan shape, ±2% by default.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      val nd: Column =
        if (approxDistinct) approx_count_distinct(col(c))
        else countDistinct(col(c))
      Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        nd.as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map { c =>
      s"'$c', ${c}__nulls, ${c}__nd, ${c}__min, ${c}__max"
    }.mkString(s"stack(${cols.size}, ", ", ", ")")
    one.select(expr(
      s"$stackExpr AS (col_name, n_nulls, n_distinct, min_s, max_s)"))
  }
}
