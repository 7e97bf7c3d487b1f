package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must register the native functions into a session built
  * with extensions — the no-code-import deployment path
  * (`--conf spark.sql.extensions=graft.functions.GraftExtensions`).
  *
  * Extensions apply at session construction, so the test builds a fresh
  * SparkSession (sharing the JVM's SparkContext) rather than reusing the
  * suite-shared one, and restores the previous default session after.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("session built with GraftExtensions resolves graft_hash48_native in SQL") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val got = spark.sql("SELECT graft_hash48_native('abc') AS h").head.getLong(0)
      val want = spark.sql(
        "SELECT CAST(conv(substring(md5('abc'), 1, 12), 16, 10) AS BIGINT) AS h")
        .head.getLong(0)
      assert(got === want)
      val dot = spark.sql(
        "SELECT graft_dotq(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head.getLong(0)
      assert(dot === 32L)
      // text kernels: values must match their declarative formulations
      val rep = spark.sql("SELECT graft_rep_ratio('a b a b a b') AS r").head.getDouble(0)
      assert(rep === 1.0 - 2.0 / 5.0)
      val sim = spark.sql("SELECT graft_simhash('a b c') AS s").head.getLong(0)
      val simWant = spark.sql(
        """SELECT graft_simhash(text) AS s FROM (SELECT 'a b c' AS text)""").head.getLong(0)
      assert(sim === simWant && sim >= 0L && sim < (1L << 48))
      val mh = spark.sql("SELECT graft_minhash('a b c d', 3, 4) AS m")
        .head.getSeq[Long](0)
      assert(mh.length === 4 && mh.forall(v => v >= 0L && v < 2147483647L))
      val shi = spark.sql("SELECT graft_shingles('x y z x y z x y', 3) AS a")
        .head.getSeq[String](0)
      assert(shi === Seq("x y z", "y z x", "z x y"))
    } finally {
      // do NOT stop(): that would kill the shared SparkContext
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
