package graft

/** Every registered query must run on sf0.001 and produce rows; every
  * oracle entry must reference a registered query. Value-level
  * correctness is the driver's DuckDB gate (emulated locally by
  * tools/check.py) — this suite guards execution and wiring. */
class QueriesSpec extends SparkTestBase {

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without a query: $extra")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
