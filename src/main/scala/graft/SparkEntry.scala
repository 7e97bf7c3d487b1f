package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CdcQueries, LlmQueries, Q, RelationalQueries, SurfaceQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query groups:
  *  - RelationalQueries: the relational operator surface (SURVEY.md §2.2)
  *  - CdcQueries: the CDC pipeline stages end-to-end in batch form
  *    (SURVEY.md §2.1 — wal2json decode, tx assembly, normalize/event-id,
  *    routing, dedup, DLQ, batching, checkpointing, timestamp parsing)
  *  - LlmQueries: training-data pipeline ops (dedup exact/MinHash-LSH/
  *    SimHash/n-gram-Jaccard/embedding-cosine, ANN search, text analysis,
  *    multimodal plumbing)
  */
object SparkEntry {

  val all: Map[String, Q.Def] =
    RelationalQueries.defs ++ SurfaceQueries.defs ++ CdcQueries.defs ++
      LlmQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full CDC pipeline (serialize -> wal2json decode -> tx assembly ->
    * normalize) over the events table.
    */
  def entry(spark: SparkSession): DataFrame =
    CdcQueries.normalized(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, Q.Def(_, Some(sql))) => k -> sql }
}
