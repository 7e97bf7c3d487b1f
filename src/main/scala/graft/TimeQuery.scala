package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Single-query timing + job/stage attribution harness for optimization
  * work (not part of the bench contract): runs the named declared
  * queries with the bench's session shape and prints per-run wall time
  * plus a per-job breakdown (description/callsite, job wall, stage task
  * time) so a slow query names its stage without a UI.
  *
  * Usage: runMain graft.TimeQuery [passes] <query> [query...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench;
  *      TIMEQ_PLAN_DIR=<dir> additionally writes each query's
  *      explain("formatted") to <dir>/<query>.txt.
  */
object TimeQuery {
  private final case class JobRec(id: Int, desc: String, start: Long,
      var end: Long = 0L, var taskTimeMs: Long = 0L, var stages: Int = 0)

  def main(args: Array[String]): Unit = {
    val passes = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption)
    val names = if (passes.isDefined) args.tail.toSeq else args.toSeq
    val nPasses = passes.getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("TIMEQ_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int)]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(e.jobId, JobRec(e.jobId, desc, e.time))
        e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val sid = e.stageInfo.stageId
        Option(stageToJob.get(sid)).flatMap(j => Option(jobs.get(j)))
          .foreach { r =>
            r.taskTimeMs +=
              e.stageInfo.taskMetrics.executorRunTime
            r.stages += 1
          }
        stageLog.add((e.stageInfo.name,
          e.stageInfo.taskMetrics.executorRunTime, e.stageInfo.numTasks))
        ()
      }
    })

    // bench-identical warmup
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    graft.queries.CdcQueries.walStream(spark, sfDir).count()
    graft.queries.CdcQueries.normalizedCached(spark, sfDir).count()

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      (1 to nPasses).foreach { p =>
        jobs.clear(); stageToJob.clear(); stageLog.clear()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[timeq] $name pass=$p wall=$wall%.2fs rows=$n")
        if (p == nPasses) {
          import scala.jdk.CollectionConverters._
          val rs = jobs.values.asScala.toSeq.sortBy(r => -(r.end - r.start))
          val totalJob = rs.map(r => math.max(0L, r.end - r.start)).sum
          println(f"[timeq] $name jobs=${rs.size} sumJobWall=${totalJob / 1e3}%.2fs")
          rs.take(14).foreach { r =>
            println(f"[timeq]   job=${r.id}%4d wall=${(r.end - r.start) / 1e3}%6.2fs " +
              f"taskTime=${r.taskTimeMs / 1e3}%7.2fs stages=${r.stages}%3d ${r.desc.take(90)}")
          }
          val st = stageLog.asScala.toSeq.sortBy(-_._2)
          st.take(12).foreach { case (nm, tt, nt) =>
            println(f"[timeq]   stage taskTime=${tt / 1e3}%7.2fs tasks=$nt%4d ${nm.take(110)}")
          }
          st.groupBy(_._1).toSeq
            .map { case (nm, xs) => (nm, xs.size, xs.map(_._2).sum, xs.map(_._3).sum) }
            .sortBy(-_._3).take(20).foreach { case (nm, c, tt, nt) =>
              println(f"[timeq]   byname n=$c%3d taskTime=${tt / 1e3}%7.2fs tasks=$nt%5d ${nm.take(100)}")
            }
        }
        sys.env.get("TIMEQ_PLAN_DIR").filter(_ => p == 1).foreach { dir =>
          val df = fn(spark, sfDir)
          df.count() // settle AQE on the final plan
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          val f = new java.io.File(dir); f.mkdirs()
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"$name.txt"),
            txt.getBytes("UTF-8"))
          ()
        }
      }
    }
    spark.stop()
  }
}
