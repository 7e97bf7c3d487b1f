package graft

import org.apache.spark.sql.functions._
import graft.cdc.Apply

/** CDC apply (MERGE-shape) semantics: WAL-order winner, DELETE removes,
  * INSERT/UPDATE replaces, untouched keys keep their base image, keys can
  * be born in the batch.
  */
class ApplySpec extends SparkSpec {
  import spark.implicits._

  private def img(v: String) = map(lit("v"), lit(v))

  test("applyChanges: winner per key, deletes, inserts, untouched") {
    val base = Seq(("t", 1L, "a"), ("t", 2L, "b"), ("t", 3L, "c"))
      .toDF("tbl", "uid", "v")
      .select($"tbl", $"uid", map(lit("v"), $"v").as("img"))
    // key 1: UPDATE(seq 10) then DELETE(seq 20) -> removed
    // key 2: DELETE(seq 10) then UPDATE(seq 20) -> updated (WAL order wins)
    // key 3: untouched -> base image survives
    // key 4: INSERT only in the batch -> born
    val changes = Seq(
      ("t", 1L, "UPDATE", Some("a2"), 10L),
      ("t", 1L, "DELETE", None, 20L),
      ("t", 2L, "DELETE", None, 10L),
      ("t", 2L, "UPDATE", Some("b2"), 20L),
      ("t", 4L, "INSERT", Some("d"), 5L))
      .toDF("tbl", "uid", "operation", "v", "seq")
      .select($"tbl", $"uid", $"operation",
        when($"v".isNotNull, map(lit("v"), $"v")).as("after"), $"seq")
    val out = Apply.applyChanges(base, $"img", changes, $"after", $"seq",
        Seq("tbl", "uid"))
      .select($"uid", element_at($"image", "v").as("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "b2", 3L -> "c", 4L -> "d"))
  }

  test("diff emits I/U/D and round-trips through applyChanges") {
    val oldV = Seq(("t", 1L, "a"), ("t", 2L, "b"), ("t", 3L, "c"))
      .toDF("tbl", "uid", "v")
      .select($"tbl", $"uid", map(lit("v"), $"v").as("img"))
    val newV = Seq(("t", 2L, "b2"), ("t", 3L, "c"), ("t", 4L, "d"))
      .toDF("tbl", "uid", "v")
      .select($"tbl", $"uid", map(lit("v"), $"v").as("img"))
    val changes = Apply.diff(oldV, $"img", newV, $"img", Seq("tbl", "uid"))
    val ops = changes.collect()
      .map(r => r.getAs[Long]("uid") -> r.getAs[String]("operation")).toMap
    // key 1 dropped, key 2 changed, key 3 unchanged (no row), key 4 born
    assert(ops == Map(1L -> "DELETE", 2L -> "UPDATE", 4L -> "INSERT"))
    // round-trip: applying the diff to old reproduces new exactly
    val applied = Apply.applyChanges(oldV, $"img",
        changes.withColumn("seq", lit(1L)), $"after", $"seq", Seq("tbl", "uid"))
      .select($"uid", element_at($"image", "v").as("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(applied == Map(2L -> "b2", 3L -> "c", 4L -> "d"))
  }

  test("applyChanges plan: ranking window runs over the batch side only") {
    val base = (1L to 100L).map(i => ("t", i, s"v$i")).toDF("tbl", "uid", "v")
      .select($"tbl", $"uid", map(lit("v"), $"v").as("img"))
    val changes = Seq(("t", 1L, "UPDATE", "x", 1L))
      .toDF("tbl", "uid", "operation", "v", "seq")
      .select($"tbl", $"uid", $"operation", map(lit("v"), $"v").as("after"), $"seq")
    val df = Apply.applyChanges(base, $"img", changes, $"after", $"seq",
      Seq("tbl", "uid"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("\\bWindow\\b".r.findAllIn(plan).size == 1,
      s"exactly one ranking window (over the change batch):\n$plan")
  }
}
