package graft.tools

import org.apache.spark.sql.SparkSession

/** Minimal interleaved-A/B harness for the bench headline (cdc_ops_sec =
  * events/sec through c03_normalize): reproduces Bench's session config
  * and warmups, times ONLY c03 (best of 3 passes), prints one JSON line.
  * Run alternately against two checked-out revisions in one session to
  * separate code effects from this host's scheduler noise (the r4→r5
  * −20% headline question) — a full Bench run per rep would cost ~6 min
  * each and measure 160 unrelated queries.
  */
object AbC03 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    graft.queries.CdcQueries.walStream(spark, sfDir).count()
    graft.queries.CdcQueries.normalizedCached(spark, sfDir).count()
    val fn = graft.SparkEntry.queries("c03_normalize")
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val nEvents = spark.read.parquet(s"$sfDir/events.parquet").count()
    println(s"""{"ab":"c03","best_sec":${times.min},""" +
      s""""times":${times.mkString("[", ",", "]")},""" +
      s""""ops_sec":${(nEvents / times.min).round}}""")
    spark.stop()
  }
}
