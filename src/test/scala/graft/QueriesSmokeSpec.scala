package graft

/** Smoke: every declared query runs and returns rows on sf0.001, and every
  * oracle-bearing query has matching column aliases on both sides (the
  * value-level equivalence is checked by tools/check.py / the driver).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.all.foreach { case (name, d) =>
    test(s"$name runs with rows on sf0.001") {
      val df = d.fn(spark, sf0001)
      assert(df.count() > 0, s"$name returned no rows")
      d.oracle.foreach { sql =>
        // cheap guard: every output column name appears in the oracle text
        val missing = df.columns.filterNot(c => sql.toLowerCase.contains(c.toLowerCase))
        assert(missing.isEmpty, s"$name: oracle SQL lacks aliases for ${missing.mkString(",")}")
      }
    }
  }
}
