package graft

import graft.queries.CurationQueries

/** Exact-value semantics for q_dsir_lift on a crafted bilingual
  * corpus, plus fixture-collision and determinism guards. */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private def writeDocs(tag: String, docs: Seq[(Long, String, String)]): String = {
    val dir = Fixtures.tempDir(tag).toString
    docs.map { case (id, lang, text) => (id, text, lang, "s", text.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** The query's feature hash, reproduced: poly-31 mod p over chars,
    * then mod the bucket count. */
  private def bucket(bg: String): Long = {
    var h = 0L
    for (c <- bg) h = (h * 31 + c.toInt) % 1000000007L
    h % CurationQueries.DsirBuckets
  }

  test("importance lift: a target-looking raw doc scores like the target, add-one smoothing exact") {
    // en doc 1 and zh doc 3 share bigram features {e1 e2, e2 e1};
    // zh doc 2 has its own {z1 z2, z2 z1}. T=5 target occurrences,
    // S=15 raw. Hand-computed smoothed lifts:
    //   b(e1 e2): tc=3 sc=6 -> (4*15e6)//(7*5)  = 1714285
    //   b(e2 e1): tc=2 sc=4 -> (3*15e6)//(5*5)  = 1800000
    //   b(z1 z2): tc=0 sc=3 -> (1*15e6)//(4*5)  =  750000
    //   b(z2 z1): tc=0 sc=2 -> (1*15e6)//(3*5)  = 1000000
    val grams = Seq("e1 e2", "e2 e1", "z1 z2", "z2 z1")
    assert(grams.map(bucket).distinct.size == 4,
      "fixture bigrams must not collide in the bucket space")
    val dir = writeDocs("dsir", Seq(
      (1L, "en", "e1 e2 e1 e2 e1 e2"),
      (2L, "zh", "z1 z2 z1 z2 z1 z2"),
      (3L, "zh", "e1 e2 e1 e2 e1 e2")))
    val got = CurationQueries.dsirLift(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val enScore = 3L * 1714285 + 2L * 1800000
    assert(got.toSeq === Seq(
      (1L, 5L, enScore, enScore / 5),
      (2L, 5L, 3L * 750000 + 2L * 1000000, (3L * 750000 + 2L * 1000000) / 5),
      (3L, 5L, enScore, enScore / 5)))
  }

  test("q_dsir_lift over sf0.001 is deterministic and covers every multi-token doc") {
    val a = CurationQueries.dsirLift(spark, sfDir).collect()
    val b = CurationQueries.dsirLift(spark, sfDir).collect()
    assert(a.toSeq === b.toSeq)
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(a.length == nDocs, "every sf0.001 doc has >= 2 tokens")
  }
}
