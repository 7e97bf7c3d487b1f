package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextAnalysis.hash48

/** Count-min sketch: the mergeable frequency summary for heavy-hitter
  * mining at corpus scale (vocabulary counts, hot subjects, URL/domain
  * frequencies) without an exact groupBy over the full key space.
  *
  * The sketch is a d×w grid of counters; item x increments cell
  * (i, h_i(x)) for each of the d row hashes, and est(x) = min_i of its
  * cells — an overestimate by at most εN (ε = e/w) with probability
  * 1 − (1/2)^d. Three properties make it the 100 TB shape:
  *
  *  - LINEAR: merge = cell-wise sum, so shards sketch independently
  *    (one narrow shuffle of d rows per item, partial-aggregated
  *    map-side) and the merged sketch is BIT-IDENTICAL to sketching
  *    the whole corpus — no rescan when a shard lands or epochs
  *    combine ([[merge]] ≡ [[sketch]] of the union, exactly).
  *  - TINY: d×w cells regardless of input size; the estimate join
  *    broadcasts the sketch, never the data.
  *  - DETERMINISTIC here: row hashes are the portable md5-derived
  *    [[TextAnalysis.hash48]] over `"i~" + token`, so a DuckDB oracle
  *    reproduces every cell and every estimate exactly — the driver
  *    gate is a hash match, not an accuracy band.
  *
  * Reference scope: the reference engine has no sketch module; this is
  * part of the training-data surface (heavy-hitter mining feeds stopword
  * discovery, boilerplate detection, and skew-aware salting choices).
  */
object CountMin {

  private def cellCol(i: Int, token: Column, w: Int): Column =
    pmod(hash48(concat(lit(s"$i~"), token)), lit(w.toLong))

  /** Build the sketch: one output row per NON-EMPTY cell — `(r, c, n)`.
    * `items` may repeat tokens (it is the event stream, not a vocab);
    * the d-fold explode is narrow and the groupBy partial-aggregates
    * map-side, so the shuffle carries at most d×w rows per task.
    */
  def sketch(items: DataFrame, tokenCol: String, d: Int, w: Int): DataFrame = {
    val cells = (0 until d).map(i =>
      struct(lit(i).as("r"), cellCol(i, col(tokenCol), w).as("c")))
    items.select(explode(array(cells: _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-shard sketches in one pass: `(shardCol, r, c, n)` — each shard
    * sketched independently (the shape in which shards land over time),
    * ready for [[merge]].
    */
  def sketchBy(items: DataFrame, tokenCol: String, shardCol: String,
      d: Int, w: Int): DataFrame = {
    val cells = (0 until d).map(i =>
      struct(lit(i).as("r"), cellCol(i, col(tokenCol), w).as("c")))
    items.select(col(shardCol), explode(array(cells: _*)).as("rc"))
      .groupBy(col(shardCol), col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("n"))
  }

  /** Merge pre-grouped shard sketches (any number, stacked in one frame
    * with identical d/w): cell-wise sum — the linearity that makes
    * per-shard sketching safe.
    */
  def merge(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("r"), col("c")).agg(sum(col("n")).as("n"))

  /** Point estimates for `candidates(tokenCol)` against a built sketch:
    * est = min over the d rows of the token's cell counts (0 when a
    * cell is empty — the token never occurred). The sketch side
    * broadcasts (≤ d×w rows); the candidate stream stays distributed.
    */
  def estimate(cms: DataFrame, candidates: DataFrame, tokenCol: String,
      d: Int, w: Int): DataFrame = {
    val cells = (0 until d).map(i =>
      struct(lit(i).as("r"), cellCol(i, col(tokenCol), w).as("c")))
    candidates.select(col(tokenCol), explode(array(cells: _*)).as("rc"))
      .select(col(tokenCol), col("rc.r").as("r"), col("rc.c").as("c"))
      .join(broadcast(cms), Seq("r", "c"), "left")
      .groupBy(col(tokenCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }
}
