package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §2.2 shuffle/partitioning row;
  * "salting for skew" is a first-class scale concern at 100 TB where a hot
  * key — one giant transaction, one viral document — stalls a single
  * reducer).
  *
  * Salting is result-invisible: the salted plans produce bit-identical
  * results to their unsalted forms (verified against the plain-SQL oracle
  * in q24), only the shuffle distribution changes.
  */
object Skew {

  /** Deterministic salt in [0, n) derived from a column — deterministic so
    * retries/recomputations route rows identically (a random salt would be
    * correct for aggregation but breaks replay debugging).
    */
  def saltOf(c: Column, n: Int): Column = pmod(xxhash64(c), lit(n.toLong))

  /** Two-phase salted sum/count aggregation: phase 1 aggregates on
    * (key, salt) — spreading a hot key over `salts` reducers — phase 2
    * combines the partials per key. Decimal-exact sums keep the result
    * identical to the unsalted plan regardless of combine order.
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], saltBy: Column,
      valueExpr: Column, salts: Int): DataFrame = {
    val keys = keyCols.map(col)
    df.withColumn("_salt", saltOf(saltBy, salts))
      .groupBy(keys :+ col("_salt"): _*)
      .agg(sum(valueExpr).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keys: _*)
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("n_rows"))
  }

  /** Skew-safe broadcast-style join for a hot-keyed fact table against a
    * small dimension: the dimension is exploded `salts`-fold with every
    * salt value, the fact side gets a deterministic salt, and the join key
    * becomes (key, salt) — so one hot key spreads over `salts` tasks even
    * under a shuffle join. With AQE's skew-join handling this is often
    * unnecessary; it remains the explicit tool when AQE can't see the skew
    * (e.g. aggregation state, not join input).
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      factSaltBy: Column, salts: Int): DataFrame = {
    val saltedDim = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    facts.withColumn("_salt", saltOf(factSaltBy, salts).cast("int"))
      .join(saltedDim, Seq(key, "_salt"))
      .drop("_salt")
  }
}
