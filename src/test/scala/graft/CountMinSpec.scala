package graft

import org.apache.spark.sql.functions._
import graft.ops.CountMin

/** Count-min sketch invariants on a synthetic skewed stream. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // zipfish stream: token_i appears ~N/i times — heavy head, long tail
  private val stream = (1 to 60).flatMap(i =>
    Seq.fill(600 / i)(s"tok$i")).toDF("tok")
  private val (d, w) = (4, 256)

  test("estimates never UNDERcount, and heavy hitters estimate exactly " +
      "when the sketch is sparse enough") {
    val cms = CountMin.sketch(stream, "tok", d, w)
    val truth = stream.groupBy($"tok").count()
    val est = CountMin.estimate(cms, stream.distinct(), "tok", d, w)
    val joined = est.join(truth, "tok")
      .select($"tok", $"est", $"count").collect()
    assert(joined.length == 60)
    joined.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"CMS must never undercount: ${r.getString(0)} est ${r.getLong(1)} < true ${r.getLong(2)}")
    }
    // the error bound: overestimate <= eN with prob 1-(1/2)^d; with 60
    // distinct tokens in 4x256 cells collisions are rare — the top-10
    // hitters must estimate within 5% (and usually exactly)
    val n = stream.count()
    joined.sortBy(-_.getLong(2)).take(10).foreach { r =>
      assert(r.getLong(1) - r.getLong(2) <= n / 20,
        s"heavy hitter ${r.getString(0)} overestimated past eN")
    }
  }

  test("merge of independently-sketched shards equals the global sketch " +
      "cell-for-cell (linearity)") {
    val sharded = stream.withColumn("shard",
      (graft.ops.TextAnalysis.hash48($"tok") % 5).cast("int"))
    val merged = CountMin.merge(
      CountMin.sketchBy(sharded, "tok", "shard", d, w).drop("shard"))
    val global = CountMin.sketch(stream, "tok", d, w)
    val diff = merged.as("m").join(global.as("g"),
        $"m.r" === $"g.r" && $"m.c" === $"g.c", "full")
      .filter($"m.n".isNull || $"g.n".isNull || $"m.n" =!= $"g.n")
    assert(diff.isEmpty, "merged shard sketches must equal the global sketch exactly")
  }

  test("the estimate join broadcasts the sketch, never the candidates") {
    val cms = CountMin.sketch(stream, "tok", d, w)
    val plan = CountMin.estimate(cms, stream.distinct(), "tok", d, w)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"sketch side must broadcast:\n$plan")
  }
}
