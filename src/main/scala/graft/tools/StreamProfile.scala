package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.cdc.{Transform, Wal2Json}
import graft.streaming.{CdcStream, OrderedSink, StreamingTxAssembly}

/** Throwaway profiling harness for the streaming pipeline: times variants
  * of the stage chain at SPARK_GRAFT_SF_DIR to locate the per-batch cost.
  * Not part of the driver contract.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")

    val tmp = graft.queries.TempDirs.workDir("graft_profile")
    val inDir = new java.io.File(s"$tmp/in"); inDir.mkdirs()
    val win = org.apache.spark.sql.expressions.Window.orderBy(col("wal_start"))
    val filed = graft.queries.CdcQueries.walStream(spark, sfDir)
      .withColumn("_f", ntile(8).over(win))
    for (f <- 1 to 8) {
      val sliceDir = s"$tmp/slice$f"
      filed.filter(col("_f") === f).drop("_f")
        .coalesce(1).sortWithinPartitions("wal_start")
        .write.mode("overwrite").parquet(sliceDir)
      val part = new java.io.File(sliceDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(inDir, f"wal-$f%02d.parquet")
      java.nio.file.Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + f * 60000L)
    }

    def raw() = spark.readStream.schema("wal_start LONG, data STRING")
      .option("maxFilesPerTrigger", "4").parquet(inDir.toString)

    var n = 0
    def time(label: String)(build: DataFrame => DataFrame,
        sink: (DataFrame, Long, String) => Unit = (df, _, _) => { df.count(); () }): Unit = {
      // warm + timed rep (min of 2)
      val walls = (1 to 2).map { rep =>
        n += 1
        val out = s"$tmp/out$n"; val ck = s"$tmp/ck$n"
        val events = build(raw())
        val t0 = System.nanoTime()
        val q = events.writeStream.outputMode("append")
          .option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
            sink(b.toDF(), id, out)
          }.start()
        q.awaitTermination()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $label%-40s ${walls.min}%.2f s")
    }

    val db = "bench"
    time("decode only")(r => Wal2Json.decode(r))
    time("decode+assembly(fMGWS)")(r =>
      StreamingTxAssembly.assemble(spark, Wal2Json.decode(r)).toDF())
    time("decode+assembly+normalize")(r =>
      Transform.normalize(StreamingTxAssembly.assemble(spark, Wal2Json.decode(r)).toDF()
        .withColumn("is_begin", lit(false)).withColumn("is_commit", lit(false)), db))
    time("full pipeline, count sink")(r => CdcStream.pipeline(spark, r, db, dedupWatermark = "3650 days"))
    time("full pipeline, ordered sink")(
      r => CdcStream.pipeline(spark, r, db, dedupWatermark = "3650 days"),
      (df, id, out) => OrderedSink.writeBatch(df, id, out))
    time("no dedup, ordered sink")(
      r => Transform.normalize(StreamingTxAssembly.assemble(spark, Wal2Json.decode(r)).toDF()
        .withColumn("is_begin", lit(false)).withColumn("is_commit", lit(false)), db),
      (df, id, out) => OrderedSink.writeBatch(df, id, out))
    time("passthrough (startup floor)")(r => r)
    time("full pipeline, ordered sink p16")(
      r => CdcStream.pipeline(spark, r, db, dedupWatermark = "3650 days"),
      (df, id, out) => OrderedSink.writeBatch(df, id, out, numPartitions = 16))
    time("full pipeline, ordered sink p32")(
      r => CdcStream.pipeline(spark, r, db, dedupWatermark = "3650 days"),
      (df, id, out) => OrderedSink.writeBatch(df, id, out, numPartitions = 32))
    spark.stop()
  }
}
