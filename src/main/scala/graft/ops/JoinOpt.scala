package graft.ops

import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Join pre-filtering for 100 TB fact-dimension joins.
  *
  * When the build side is too large to broadcast but still selective on
  * the probe side (a filtered dimension vs a full fact table), shuffling
  * the whole fact table into the join wastes the bulk of the exchange on
  * rows that can never match. The standard fix is a Bloom-filter
  * pre-filter: aggregate the build side's join keys into a Bloom filter
  * (a few MB for hundreds of millions of keys), broadcast THAT, and drop
  * non-matching probe rows before the shuffle. False positives only —
  * the subsequent real join restores exactness; matching rows are never
  * dropped.
  *
  * Spark's AQE injects the same shape on its own in narrow cases
  * (runtime row-level filtering); this operator makes the pattern
  * explicit and tunable — `expectedItems`/`numBits` size the filter, and
  * the probe-side `might_contain` is a codegen'd scalar that evaluates
  * before the exchange, exactly where a pushed filter would sit. Uses
  * Spark's own `BloomFilterAggregate`/`BloomFilterMightContain`
  * expressions (not SQL-registered, hence the shim).
  */
object JoinOpt {

  /** Inner equi-join of `probe` ⋈ `build` on `key`, with the probe side
    * pre-filtered through a Bloom filter of the build side's keys. Result
    * is EXACTLY `probe.join(build, key)` (asserted in ScaleSpec); only
    * the shuffle volume changes.
    */
  def bloomPrefilteredJoin(probe: DataFrame, build: DataFrame, key: String,
      expectedItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    val bfAgg = new BloomFilterAggregate(
      GraftSqlShim.expression(xxhash64(col(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bf = build.agg(GraftSqlShim.column(bfAgg).as("_bf"))
    probe
      .filter(GraftSqlShim.column(BloomFilterMightContain(
        GraftSqlShim.expression(GraftSqlShim.scalarSubquery(bf)),
        GraftSqlShim.expression(xxhash64(col(key))))))
      .join(build, Seq(key))
  }
}
