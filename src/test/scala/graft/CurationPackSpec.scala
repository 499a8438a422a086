package graft

import graft.queries.{CorpusQueries, DedupQueries, TextQueries}

/** Crafted-fixture semantics for the round-10 curation pack:
  * containment near-dup, provenance-priority keep, token-budget
  * selection, and fixed-point BM25 retrieval. */
class CurationPackSpec extends SparkTestBase {
  import spark.implicits._

  private def writeDocs(tag: String, docs: Seq[(Long, String, String)]): String = {
    val dir = Fixtures.tempDir(tag).toString
    docs.map { case (id, src, text) => (id, text, "en", src, text.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("containment: a doc pasted inside a longer one flags from the short side") {
    // A's 3 shingles are all inside B (A's text is B's prefix);
    // jaccard = 3/8 < the symmetric 0.9 bar, containment from A = 1.0
    val a = "w1 w2 w3 w4 w5"
    val dir = writeDocs("contain", Seq(
      (1L, "s", a),
      (2L, "s", a + " x1 x2 x3 x4 x5"),
      (3L, "s", "u1 u2 u3 u4 u5 u6")))
    val rows = TextQueries.dedupContainment(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (1L, 2L, 3L, 3L, 8L))
    assert(r.getDouble(5) == 1.0 && r.getDouble(6) == 0.375)
    assert(r.getLong(7) == 1L, "the SHORT doc is the contained one")
  }

  test("containment: sub-0.9 overlap from both sides is not flagged") {
    // 2 of A's 4 shingles shared: cont_a = 0.5, cont_b = 2/4 — below bar
    val dir = writeDocs("contain2", Seq(
      (1L, "s", "w1 w2 w3 w4 z1 z2"),
      (2L, "s", "w1 w2 w3 w4 y1 y2")))
    assert(TextQueries.dedupContainment(spark, dir).collect().isEmpty)
  }

  test("priority keep: lowest source rank wins, ties break to min doc_id") {
    // identical texts → simhash hamming 0 → one cluster each
    val t1 = "alpha beta gamma delta epsilon zeta eta theta"
    val t2 = "one two three four five six seven eight nine"
    val dir = writeDocs("prio", Seq(
      (10L, "src5", t1), (11L, "src2", t1), (12L, "src9", t1),
      (20L, "src1", t2), (21L, "src1", t2)))
    val got = DedupQueries.priorityQ(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toList
    assert(got == List(
      (10L, 3L, 11L, 2),  // cluster of t1: src2 beats src5/src9
      (20L, 2L, 20L, 1))) // cluster of t2: rank tie → min doc_id
  }

  test("budget select: per-source quality-ordered prefix under the 600-token budget") {
    // 300 tokens each; doc 1 all-stopword ("the") → quality 1.0;
    // docs 2,3 identical quality 0.7 → id order. cum 300/600/900 →
    // docs 1,2 selected, 3 over budget.
    val dir = writeDocs("budget", Seq(
      (1L, "s0", Seq.fill(300)("the").mkString(" ")),
      (2L, "s0", Seq.fill(300)("aa").mkString(" ")),
      (3L, "s0", Seq.fill(300)("bb").mkString(" "))))
    val got = CorpusQueries.budgetSelect(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(4), r.getLong(5)))
      .toList
    assert(got == List(
      ("s0", 1, 1L, 300L, 300L),
      ("s0", 2, 2L, 300L, 600L)))
  }

  test("bm25: integer fixed-point scores match the spec formula, ranks deterministic") {
    val dir = writeDocs("bm25", Seq(
      (1L, "s", "spark spark x"),
      (2L, "s", "spark y z z"),
      (3L, "s", "vector a b"),
      (4L, "s", "c d e")))
    // corpus constants: N=4 docs, T=13 tokens; df(spark)=2, df(vector)=1
    val (nD, t) = (4L, 13L)
    def score(tf: Long, dl: Long, df: Long): Long = {
      val a = (44L * t * tf * 1000000L) / (20L * t * tf + 6L * t + 18L * nD * dl)
      a * (2 * nD - 2 * df + 1) / (2 * df + 1)
    }
    val expect = Map(
      1L -> score(2, 3, 2), // spark twice
      2L -> score(1, 4, 2),
      3L -> score(1, 3, 1)) // rarer term → bigger idf ratio
    val got = CorpusQueries.bm25Topk(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3))).toList
    assert(got.map(_._2).toSet == expect.keySet, "doc 4 (no term) must be absent")
    got.foreach { case (_, doc, nt, sc) =>
      assert(nt == 1 && sc == expect(doc), s"doc $doc score $sc != ${expect(doc)}")
    }
    // ranks follow (score desc, doc_id)
    val byScore = expect.toSeq.sortBy { case (d, sc) => (-sc, d) }.map(_._1)
    assert(got.sortBy(_._1).map(_._2) == byScore)
  }
}
