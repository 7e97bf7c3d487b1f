package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: multi-column clustering so min/max file
  * statistics prune on EVERY clustered column, not just the sort prefix.
  *
  * A lexicographic sort on (x, y) gives perfect pruning on x and none on
  * y; interleaving the bits of x and y into one z-value and range-
  * partitioning + sorting on it makes each output file cover a small
  * RECTANGLE in (x, y) space — a box predicate on either column (or both)
  * skips most files at the parquet footer, the layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`. At 100 TB the win is the scan you
  * never run: the layout is one range-exchange at write time (sampled
  * RangePartitioning — no global sort buffer), amortized over every
  * subsequent selective read.
  *
  * The interleave is pure integer column arithmetic (three shift/mask
  * rounds per 16-bit dim — the classic bit-spread), so it stays inside
  * whole-stage codegen AND the identical expression runs in the DuckDB
  * oracle bit-for-bit: [[spreadSql]] emits the same chain from the same
  * masks, keeping the driver gate an exact hash match.
  */
object Layout {

  /** Bit-spread masks: after round i, value bits sit 2^i apart. */
  private val rounds: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL,
    4 -> 0x0F0F0F0FL,
    2 -> 0x33333333L,
    1 -> 0x55555555L)

  /** Spread a 16-bit value's bits to the even positions of a 32-bit
    * lane (BIGINT arithmetic throughout).
    */
  def spread16(v: Column): Column =
    rounds.foldLeft(v.bitwiseAND(lit(0xFFFFL))) { case (acc, (s, m)) =>
      acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  /** The same spread as DuckDB SQL text, generated from the same masks —
    * one source of truth for both engines.
    */
  def spreadSql(e: String): String =
    rounds.foldLeft(s"($e & 65535)") { case (acc, (s, m)) =>
      s"(($acc | ($acc << $s)) & $m)"
    }

  /** 2-D Morton code: x in even bits, y in odd bits (32 significant bits). */
  def zvalue2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The same z-value as DuckDB SQL text. */
  def zvalue2Sql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** 3-way bit-spread masks: 10-bit values to every-3rd-bit positions. */
  private val rounds3: Seq[(Int, Long)] = Seq(
    16 -> 0x030000FFL,
    8 -> 0x0300F00FL,
    4 -> 0x030C30C3L,
    2 -> 0x09249249L)

  /** Spread a 10-bit value's bits 3 apart (30-bit lane). */
  def spread10x3(v: Column): Column =
    rounds3.foldLeft(v.bitwiseAND(lit(0x3FFL))) { case (acc, (s, m)) =>
      acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  def spread10x3Sql(e: String): String =
    rounds3.foldLeft(s"($e & 1023)") { case (acc, (s, m)) =>
      s"(($acc | ($acc << $s)) & $m)"
    }

  /** 3-D Morton code over 10-bit dims (30 significant bits) — the same
    * min/max-skipping layout as [[zvalue2]] when a THIRD column (a time
    * bucket, typically) must also prune.
    */
  def zvalue3(x: Column, y: Column, z: Column): Column =
    spread10x3(x)
      .bitwiseOR(shiftleft(spread10x3(y), 1))
      .bitwiseOR(shiftleft(spread10x3(z), 2))

  def zvalue3Sql(x: String, y: String, z: String): String =
    s"(${spread10x3Sql(x)} | (${spread10x3Sql(y)} << 1) | " +
      s"(${spread10x3Sql(z)} << 2))"

  /** Cluster a frame for 2-D skipping: one sampled range exchange on the
    * z-value + an in-partition sort, so each output file's (x, y)
    * bounding box is a small z-curve segment. Columns `xCol`/`yCol` must
    * already be bucketed to 16-bit non-negative ints by the caller (the
    * quantization IS the layout resolution choice).
    */
  def cluster(df: DataFrame, xCol: String, yCol: String,
      nPartitions: Int): DataFrame = {
    val z = zvalue2(col(xCol), col(yCol)).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(nPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Per-partition (≅ per-file) bounding boxes of a clustered frame —
    * the direct measure of layout quality: sum of box areas ≪ the
    * unclustered layout's means a box predicate prunes most files.
    */
  def boundingBoxes(clustered: DataFrame, xCol: String, yCol: String): DataFrame =
    clustered
      .withColumn("__pid", spark_partition_id())
      .groupBy(col("__pid"))
      .agg(min(xCol).as("x_min"), max(xCol).as("x_max"),
        min(yCol).as("y_min"), max(yCol).as("y_max"),
        count(lit(1)).as("n_rows"))
}
