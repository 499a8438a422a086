package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomDecon
import graft.queries.CorpusQueries

/** The bloom pre-filter contract (`q_decon_bloom` /
  * `operators/BloomDecon`): membership probing never loses a true
  * member (no false negatives), so the two-phase plan — bloom prune,
  * then exact join — must return BIT-IDENTICAL results to the pure
  * exact decontamination scan. Split fixture arithmetic as in
  * CorpusQueriesSpec: bucket = (doc_id * 61) % 100 for doc_id < 1e8.
  */
class BloomDeconSpec extends SparkTestBase {
  import spark.implicits._

  private def writeDocs(tag: String, docs: Seq[(Long, String, String)]): String = {
    val dir = Fixtures.tempDir(tag).toString
    docs.map { case (id, src, text) => (id, text, "en", src, text.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("two-phase bloom plan equals the exact scan on the test corpus") {
    val exact = CorpusQueries.contaminationNgram(spark, sfDir).collect().toList
    val bloom = CorpusQueries.deconBloom(spark, sfDir).collect().toList
    assert(bloom == exact,
      "bloom prefilter + exact confirm must be bit-identical to the exact plan")
  }

  test("no false negatives: every member of the build set probes true") {
    val vals = (0L until 5000L).map(i => s"member-$i")
    val df = vals.toDF("v")
    val bits = BloomDecon.build(df, col("v")).get
    val misses = df.filter(!BloomDecon.mightContain(spark, bits, col("v"))).count()
    assert(misses == 0L, "a bloom filter can never report false negatives")
  }

  test("pruning is real: non-members are overwhelmingly rejected at the default sizing") {
    val members = (0L until 5000L).map(i => s"member-$i").toDF("v")
    val bits = BloomDecon.build(members, col("v")).get
    val probes = (0L until 20000L).map(i => s"other-$i").toDF("v")
    val fp = probes.filter(BloomDecon.mightContain(spark, bits, col("v"))).count()
    // 1M bits / 5k items (r19 default) -> per-probe FP rate ~1e-10;
    // allow enormous slack
    assert(fp <= 20L, s"false-positive mass $fp of 20000 breaks the pruning claim")
  }

  test("planted 8-gram leak is flagged identically by both plans") {
    val shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    val dir = writeDocs("bloomdec", Seq(
      (1L, "s", s"lead $shared tail"),   // train (bucket 61): carries the gram
      (90L, "s", s"x y $shared z"),      // val (bucket 90): contaminated
      (95L, "s", "clean doc with eight distinct words here ok"), // test: clean
      (2L, "s", "short train")))         // train, too short to gram
    val exact = CorpusQueries.contaminationNgram(spark, dir).collect().toList
    val bloom = CorpusQueries.deconBloom(spark, dir).collect().toList
    assert(bloom == exact)
    val byodSplit = bloom.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byodSplit("val") == ((1L, 1L, 1L)), "val doc must be flagged with 1 hit gram")
    assert(byodSplit("test")._2 == 0L, "clean test doc must not be flagged")
  }

  test("build on an empty frame returns None and the query still answers") {
    val empty = Seq.empty[String].toDF("v")
    assert(BloomDecon.build(empty, col("v")).isEmpty)
  }
}
