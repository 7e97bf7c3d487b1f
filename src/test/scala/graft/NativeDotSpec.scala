package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NativeDot

/** The native codegen'd DotProductQ must be numerically identical to the
  * aggregate(zip_with(...)) composition it replaces — that identity keeps
  * the similarity-family oracles (exact integer arithmetic) intact.
  */
class NativeDotSpec extends AnyFunSuite with SparkSpec {

  private def builtinDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  test("native dotQ equals the aggregate(zip_with) composition") {
    import spark.implicits._
    val gen = new scala.util.Random(11)
    val rows = Seq.fill(50)((
      Seq.fill(64)(gen.nextInt(20001).toLong - 10000),
      Seq.fill(64)(gen.nextInt(20001).toLong - 10000))) :+
      ((Seq.empty[Long], Seq.empty[Long])) :+
      ((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)))
    val df = rows.toDF("a", "b")
    val n = df.filter(
      NativeDot.dotQNative(col("a"), col("b")) =!= builtinDot(col("a"), col("b"))).count()
    assert(n == 0)
    assert(df.filter(size(col("a")) === 3)
      .select(NativeDot.dotQNative(col("a"), col("b"))).head.getLong(0) == 32L)
  }

  test("null input -> null output") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L, 2L)), Seq(3L, 4L)), (None, Seq(3L, 4L)))
      .toDF("a", "b")
    val rows = df.select(NativeDot.dotQNative(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(rows(0).contains(11L) && rows(1).isEmpty)
  }

  test("stays inside whole-stage codegen on a non-foldable source") {
    // a local Seq constant-folds to LocalTableScan; range() does not
    val df = spark.range(100).select(
      transform(sequence(lit(1L), lit(8L)), i => col("id") + i).as("a"),
      transform(sequence(lit(1L), lit(8L)), i => col("id") * i).as("b"))
    val sel = df.select(NativeDot.dotQNative(col("a"), col("b")).as("d"))
    assert(sel.collect().length == 100)
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(500))
  }
}
