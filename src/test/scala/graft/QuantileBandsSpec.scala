package graft

import graft.queries.AnalyticsQueries

/** `q_quantile_bands` semantics: p50/p90 are the k-th smallest
  * n_chars at k = ⌈p·n⌉ computed in exact integer arithmetic
  * (k50 = (n+1) DIV 2, k90 = (9n+9) DIV 10), and the GK sketch flags
  * assert the approx values inside 5% of those order statistics.
  */
class QuantileBandsSpec extends SparkTestBase {
  import spark.implicits._

  test("order statistics hit the hand-computed ranks per source") {
    val dir = Fixtures.tempDir("qband").toString
    // source a: n_chars 10..100 (n=10) -> k50 = 5 -> 50; k90 = 9 -> 90
    // source b: n_chars 1..4 (n=4)    -> k50 = 2 -> 2;  k90 = 4 -> 4
    val docs =
      (1 to 10).map(i => (i.toLong, s"t$i", "en", "a", i * 10)) ++
        (1 to 4).map(i => (100L + i, s"u$i", "en", "b", i))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = AnalyticsQueries.quantileBands(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getInt(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap
    assert(got("a") == ((10L, 50, 90, true, true)))
    assert(got("b") == ((4L, 2, 4, true, true)))
  }

  test("sketch flags hold on the test corpus") {
    val rows = AnalyticsQueries.quantileBands(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(4) && r.getBoolean(5)),
      "percentile_approx at accuracy 10000 must sit within 5% of the exact order statistics")
  }
}
