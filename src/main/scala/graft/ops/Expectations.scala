package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation suite (the Deequ/dbt-test shape): declared
  * row-level predicates, uniqueness, and referential integrity evaluated
  * as ONE aggregate pass over the audited table — the gate a training-data
  * pipeline runs on every landed batch before it joins the corpus.
  *
  * Scale shape: N row-level checks cost one scan regardless of N (each is
  * a SUM of a codegen'd boolean cast, partial-aggregated map-side);
  * uniqueness rides the same pass as a COUNT(DISTINCT); referential
  * integrity is a broadcast anti-join against the (small) parent key set
  * — the fact table is never shuffled. Output is one verdict row per
  * check, so the result is driver-tiny no matter the input.
  */
object Expectations {

  /** One row-level expectation: rows where `holds` is false are
    * violations. NULL predicate results count as violations (a NULL
    * answer to "is this row acceptable" is not a yes).
    */
  final case class RowCheck(name: String, holds: Column)

  /** Evaluate row-level checks + optional uniqueness in one pass:
    * `(check, total, violations, passed)`, one row per check.
    */
  def audit(df: DataFrame, checks: Seq[RowCheck],
      uniqueCols: Seq[String] = Nil): DataFrame = {
    val names = checks.map(_.name) ++ uniqueCols.map(u => s"unique_$u")
    require(names.distinct == names,
      s"expectation names collide (${names.diff(names.distinct).distinct
        .mkString(", ")}): a RowCheck named 'unique_X' alongside " +
        "uniqueCols('X') would produce two v_unique_X agg columns — " +
        "ambiguous reference or a wrong verdict mapping")
    val aggs =
      checks.map(c =>
        sum(when(coalesce(c.holds, lit(false)), 0L).otherwise(1L))
          .as(s"v_${c.name}")) ++
      uniqueCols.map(u =>
        (count(lit(1)) - countDistinct(col(u))).as(s"v_unique_$u"))
    val totals = df.agg(count(lit(1)).as("total"), aggs: _*)
    val verdicts = names.map { n =>
      struct(lit(n).as("check"), col("total"),
        col(s"v_$n").as("violations"))
    }
    totals.select(explode(array(verdicts: _*)).as("r"))
      .select(col("r.check"), col("r.total"), col("r.violations"),
        (col("r.violations") === 0L).as("passed"))
  }

  /** Referential integrity: child keys not present in the parent key set
    * (NULL child keys are orphans unless `allowNull`). The parent side is
    * broadcast — the child is scanned once, never shuffled.
    */
  def fkAudit(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      name: String, allowNull: Boolean = false): DataFrame = {
    val keys = parent.select(col(parentKey).as("__pk")).distinct()
    val candidates =
      if (allowNull) child.filter(col(childKey).isNotNull) else child
    val orphans = candidates
      .join(broadcast(keys), col(childKey) === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val total = child.agg(count(lit(1)).as("total"))
    total.crossJoin(broadcast(orphans))
      .select(lit(name).as("check"), col("total"), col("violations"),
        (col("violations") === 0L).as("passed"))
  }
}
