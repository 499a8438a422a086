package graft

/** The driver's oracle gate hash-compares values — any
  * nondeterminism (collect order, float reduction order, rand) in a
  * query would flake it. Guard: every oracle-checked query must
  * produce identical ordered output across two runs in one session.
  */
class DeterminismSpec extends SparkTestBase {

  for (name <- SparkEntry.oracleSql.keys.toSeq.sorted) {
    test(s"$name is run-to-run deterministic") {
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sfDir).collect().map(_.toString)
      val b = fn(spark, sfDir).collect().map(_.toString)
      assert(a.sameElements(b), s"$name differs between runs")
    }
  }
}
