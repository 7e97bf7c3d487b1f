package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Plan-inspection harness: prints the formatted physical plan of selected
  * queries plus a scalability scorecard (pushed filters, read schemas,
  * broadcast vs shuffle joins, whole-stage-codegen coverage).
  *
  * Usage: runMain graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.all.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      SparkEntry.all.get(name).foreach { d =>
        val df = d.fn(spark, sfDir)
        df.collect() // execute THIS plan so AQE settles on its final form
        val finalPlan = df.queryExecution.executedPlan.toString
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        def count(where: String, s: String) = where.sliding(s.length).count(_ == s)
        val pushed = formatted.linesIterator
          .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
          .map(_.trim.take(120)).toList
        println(s"== $name")
        println(s"   scans=${count(finalPlan, "Scan parquet")} " +
          s"bhj=${count(finalPlan, "BroadcastHashJoin")} " +
          s"smj=${count(finalPlan, "SortMergeJoin")} " +
          s"shj=${count(finalPlan, "ShuffledHashJoin")} " +
          s"exchanges=${count(finalPlan, "Exchange")} " +
          s"wscg_spans=${count(finalPlan, "*(")}")
        pushed.foreach(l => println(s"   $l"))
        if (sys.env.contains("EXPLAIN_FULL")) println(finalPlan)
      }
    }
    spark.stop()
  }

  // referenced to keep the import warm for future plan assertions
  private def unused(p: SparkPlan): Unit = ()
}
