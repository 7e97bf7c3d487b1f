package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Query-surface plumbing shared by the query groups.
  *
  * Oracle-parity rules (the driver hash-compares against DuckDB on the same
  * parquet, see Verify.scala):
  *  - every output column is explicitly aliased, identically on both sides;
  *  - every query ends in a total ORDER BY (unique tie-breaker included);
  *  - double aggregation is done exactly: cast to DECIMAL(12,2) -> exact
  *    decimal sum -> one final CAST AS DOUBLE (identical IEEE result in any
  *    engine and any partitioning — floating sums would differ per run);
  *  - averages are CAST(sum_dec AS DOUBLE) / count (one IEEE division);
  *  - hashes are md5-derived integer arithmetic (portable), never
  *    engine-native hash functions.
  */
object Q {
  type Fn = (SparkSession, String) => DataFrame

  /** One declared query: the Spark implementation + its DuckDB oracle SQL
    * (None -> driver falls back to a rows-only check).
    */
  final case class Def(fn: Fn, oracle: Option[String])

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as parquet TIMESTAMP(NANOS) (no native Spark
      // type — read the raw int64 nanos and floor-truncate to micros, exactly
      // what DuckDB does) and as native TIMESTAMP(MICROS) without the UTC
      // flag (Spark infers TIMESTAMP_NTZ). Normalize both to TimestampType
      // micros: the session TZ is pinned UTC, so the NTZ wall-clock IS the
      // UTC instant and every downstream query sees one stable type.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      raw.schema("ts").dataType match {
        case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Exact money arithmetic: DECIMAL(12,2) keeps products within both
    * engines' 38-digit cap (12+12 -> 25 digits, *3 -> 38).
    */
  def dec(c: Column): Column = c.cast("decimal(12,2)")
}
