package graft

import graft.queries.DedupQueries

/** Semantics of the keep-BEST canonical selection (`q_dedup_canonical`):
  * within a near-dup cluster the highest-quality document survives, not
  * the min-id one — and ties fall back to the smallest doc_id. The
  * fixture builds a guaranteed cluster by repeating the same token
  * sequence (doubling every token's weight flips no simhash sign bit,
  * so the pair verifies at Hamming 0) while the repetition raises the
  * length-saturation term of the quality score.
  */
class DedupCanonicalSpec extends SparkTestBase {
  import spark.implicits._

  private def writeDocs(tag: String, docs: Seq[(Long, String)]): String = {
    val dir = Fixtures.tempDir(tag).toString
    docs.map { case (id, text) => (id, text, "en", "s", text.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private val base = (0 until 12).map(i => s"w$i").mkString(" ")

  test("keep-best: the longer (higher-quality) near-dup wins over the min-id doc") {
    val dir = writeDocs("canq", Seq(
      1L -> base,
      2L -> s"$base $base $base",          // same simhash, higher length score
      7L -> "zz yy xx vv uu tt ss rr qq")) // unrelated, unclustered
    val got = DedupQueries.canonicalQ(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List((1L, 2L, 2L)), s"expected cluster 1 keeping doc 2, got $got")
    val Array(best) = DedupQueries.canonicalQ(spark, dir)
      .select("best_quality").collect().map(_.getDouble(0))
    val q = graft.functions.TextFunctions.qualityScore(
      org.apache.spark.sql.functions.lit(s"$base $base $base"))
    val Array(expected) = spark.range(1).select(q).collect().map(_.getDouble(0))
    assert(best == expected, "best_quality must be the keeper's quality score")
  }

  test("tie-break: equal quality keeps the smallest doc_id") {
    val dir = writeDocs("cant", Seq(3L -> base, 9L -> base))
    val got = DedupQueries.canonicalQ(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got == List((3L, 2L, 3L)), s"expected tie to keep doc 3, got $got")
  }
}
