package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cdc.{Transform, TxAssembly, Wal2Json}
import graft.queries.CdcQueries

/** Throwaway profiling harness for the BATCH cdc_ops_sec headline: times
  * each prefix of the c03 chain (decode → assemble → normalize → c03's
  * final projection+sort) at SPARK_GRAFT_SF_DIR, best-of-N per stage, to
  * locate where wall time lives. Not part of the driver contract.
  */
object CdcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // same warmup as Bench
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    CdcQueries.walStream(spark, sfDir).count()
    CdcQueries.normalizedCached(spark, sfDir).count()

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[cdcprofile] $name%-28s min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    def q(name: String) = graft.SparkEntry.queries(name)(spark, sfDir)

    time("walStream(cached)")(CdcQueries.walStream(spark, sfDir))
    time("decode")(Wal2Json.decode(CdcQueries.walStream(spark, sfDir)))
    time("decode+assemble")(TxAssembly.assemble(
      Wal2Json.decode(CdcQueries.walStream(spark, sfDir))))
    time("decode+assemble+normalize")(Transform.normalize(TxAssembly.assemble(
      Wal2Json.decode(CdcQueries.walStream(spark, sfDir))), CdcQueries.Db))
    time("c03_full(query)")(q("c03_normalize"))
    time("c03_no_orderby")(q("c03_normalize").queryExecution.analyzed match {
      case _ =>
        import org.apache.spark.sql.functions.{col, element_at}
        CdcQueries.normalized(spark, sfDir)
          .select(col("event_id"), col("event_type"), col("source"),
            col("lsn"), col("txid"), col("schema").as("schema_name"),
            col("table").as("table_name"),
            col("operation"), col("subject"), col("commit_time"),
            element_at(col("after"), "value").as("after_value"))
    })
    time("normalizedCached.count")(CdcQueries.normalizedCached(spark, sfDir))
    val prebuilt = q("c03_normalize")
    time("c03_prebuilt_plan")(prebuilt)
    println(s"[cdcprofile] walStream partitions = " +
      CdcQueries.walStream(spark, sfDir).rdd.getNumPartitions)
    println(s"[cdcprofile] normalizedCached partitions = " +
      CdcQueries.normalizedCached(spark, sfDir).rdd.getNumPartitions)
    if (sys.env.get("SPARK_GRAFT_PROFILE_EXPLAIN").contains("1")) {
      println("==== c03.count() physical plan ====")
      println(q("c03_normalize").groupBy().count().queryExecution.executedPlan)
    }
    spark.stop()
  }
}
