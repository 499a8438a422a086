package graft

import org.apache.spark.sql.functions._

import graft.queries.CorpusQueries

/** Crafted-fixture semantics for the corpus-curation operators. The
  * split fixture exploits 2654435761 ≡ 61 (mod 100): for doc_id < 1e8
  * the split bucket is `(doc_id * 61) % 100`, so id 1 → bucket 61
  * (train), ids 90/190 → bucket 90 (val), id 95 → bucket 95 (test). */
class CorpusQueriesSpec extends SparkTestBase {
  import spark.implicits._

  private def writeDocs(tag: String, docs: Seq[(Long, String, String)]): String = {
    val dir = Fixtures.tempDir(tag).toString
    docs.map { case (id, src, text) => (id, text, "en", src, text.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("contaminationNgram flags eval docs sharing an 8-gram with train; short docs still counted") {
    val shared = "c1 c2 c3 c4 c5 c6 c7 c8"
    val dir = writeDocs("contam", Seq(
      (1L, "s", s"lead $shared tail"),            // train: carries the gram
      (90L, "s", s"x y $shared z"),               // val: contaminated (1 gram hit)
      (190L, "s", "too short for grams"),         // val: < 8 tokens, zero grams
      (95L, "s", "p q r s t u v w y")))           // test: clean
    val got = CorpusQueries.contaminationNgram(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(got == List(
      ("test", 1L, 0L, 0L),
      ("train", 1L, 0L, 0L),
      ("val", 2L, 1L, 1L)))
  }

  test("repeatedGrams: only inter-doc shared trigrams count") {
    val dir = writeDocs("repgrams", Seq(
      (1L, "x", "p q r s"),    // shingles: "p q r", "q r s"
      (2L, "y", "p q r t")))   // shingles: "p q r", "q r t" — "p q r" shared
    val got = CorpusQueries.repeatedGrams(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toList
    assert(got == List(
      ("x", 1L, 2L, 1L, 0.5, 0.5),
      ("y", 1L, 2L, 1L, 0.5, 0.5)))
  }

  test("chunkDocs: 32-token chunks on a 24 stride, tail kept, fingerprints pin content") {
    val toks = (0 until 33).map(i => s"a$i")
    val dir = writeDocs("chunks", Seq(
      (1L, "s", toks.mkString(" ")),         // 33 tokens → chunks (0,32) + (24,9)
      (2L, "s", "b0 b1 b2")))                // 3 tokens → one chunk (0,3)
    val got = CorpusQueries.chunkDocs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toList
    assert(got == List(
      (1L, 0L, 0L, 32L, md5hex(toks.slice(0, 32).mkString(" "))),
      (1L, 1L, 24L, 9L, md5hex(toks.slice(24, 33).mkString(" "))),
      (2L, 0L, 0L, 3L, md5hex("b0 b1 b2"))))
  }

  test("mixtureWeights: weights normalize to 1 and epochs follow the budget formula") {
    val rows = CorpusQueries.mixtureWeights(spark, sfDir).collect()
    assert(rows.length > 1)
    val wsum = rows.map(_.getDouble(3)).sum
    assert(math.abs(wsum - 1.0) < 1e-9)
    rows.foreach { r =>
      val (nTok, w, e) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(e == 1000000.0 * w / nTok.toDouble)
    }
  }

  test("oovRate: occurrences outside the deterministic top-100 df vocab") {
    // Source sA: one doc of 120 distinct singleton tokens t000..t119.
    // Source sB: three docs of "common common" → df(common)=3, rank 1.
    // Vocab = common + the 99 alphabetically-first singletons
    // (t000..t098); sA's OOV mass is the other 21 singletons.
    val singletons = (0 until 120).map(i => f"t$i%03d")
    val dir = writeDocs("oov",
      (1L, "sA", singletons.mkString(" ")) +:
        (2L to 4L).map(id => (id, "sB", "common common")))
    val got = CorpusQueries.oovRate(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toList
    assert(got == List(
      ("sA", 120L, 21L, 21.0 / 120.0),
      ("sB", 6L, 0L, 0.0)))
  }

  test("dupSpans: maximal cross-doc shared-gram runs as token extents; short runs filtered") {
    // Docs 1/2 share the 6-token run s1..s6 → 4 interior shared
    // 3-grams (boundary grams differ), a span of exactly the ≥4
    // threshold: doc 1 flagged at pos 2..5 → [2, 7]; doc 2 at 1..4
    // → [1, 6]. Docs 3/4 share only a 5-token run → 3 grams → below
    // the threshold, no rows.
    val dir = writeDocs("spans", Seq(
      (1L, "s", "u1 u2 s1 s2 s3 s4 s5 s6 u3 u4"),
      (2L, "s", "v1 s1 s2 s3 s4 s5 s6 v2"),
      (3L, "s", "w1 p1 p2 p3 p4 p5 w2"),
      (4L, "s", "x1 p1 p2 p3 p4 p5 x2")))
    val got = CorpusQueries.dupSpans(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toList
    assert(got == List(
      (1L, 2, 7, 4L),
      (2L, 1, 6, 4L)))
  }

  test("spanClean: cuts span extents, counts touching-extent tokens once, all-cut doc → empty text") {
    // Doc 1 carries two islands whose TOKEN extents overlap at token 5
    // (c6): grams 0-3 shared with doc 2 → extent [0,5]; grams 5-9
    // shared with doc 3 → extent [5,11]. The union covers all 12
    // tokens — n_cut must be 12 (token 5 counted ONCE, not per
    // matching span) and clean_text empty. Docs 2/3 lose only their
    // shared runs.
    val dir = writeDocs("spanclean", Seq(
      (1L, "s", "c1 c2 c3 c4 c5 c6 d1 d2 d3 d4 d5 d6"),
      (2L, "s", "y1 c1 c2 c3 c4 c5 c6 y2"),
      (3L, "s", "w1 c6 d1 d2 d3 d4 d5 d6 w2")))
    val got = CorpusQueries.spanClean(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
    assert(got == List(
      (1L, 12L, ""),
      (2L, 6L, "y1 y2"),
      (3L, 7L, "w1 w2")))
  }

  test("qualityFilter: per-source integer rule counts, one rule isolated per fixture doc") {
    def words(n: Int, len: Int, prefix: String): Seq[String] =
      (1 to n).map(i => (prefix + i.toString).padTo(len, 'x').take(len))
    def doc(toks: Seq[String]) = toks.mkString(" ")
    val passAll = doc(Seq("the", "a") ++ words(28, 4, "a"))   // 30 toks, mean 116/30
    val failLen = doc(Seq("the", "a") ++ words(18, 4, "b"))   // 20 toks < 30
    val failRep = doc(Seq("the", "a") ++ Seq.fill(7)("zzzz") ++ words(21, 4, "c")) // max_tf 7, 5*7>30
    val failStop = doc(Seq("the") ++ words(29, 4, "d"))       // 1 stopword < 2
    val failMean = doc(Seq("the", "a") ++ words(28, 12, "e")) // 340 chars > 10*30
    val dir = writeDocs("qfilter", Seq(
      (1L, "sA", passAll), (2L, "sA", failLen),
      (3L, "sA", failRep), (4L, "sA", failStop),
      (5L, "sB", failMean)))
    val got = CorpusQueries.qualityFilter(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toList
    assert(got == List(
      ("sA", 4L, 3L, 4L, 3L, 3L, 1L),
      ("sB", 1L, 1L, 0L, 1L, 1L, 0L)))
  }

  test("lengthHist: log2 buckets via binary-string length, grouped by source") {
    // n_chars = text.length (writeDocs): 5 → bin "101" → bucket 3;
    // 8 → "1000" → bucket 4.
    val dir = writeDocs("lenhist", Seq(
      (1L, "sA", "ab cd"), (2L, "sA", "abc d"), (3L, "sB", "abcdefgh")))
    val got = CorpusQueries.lengthHist(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toList
    assert(got == List(
      ("sA", 3, 2L, 10L),
      ("sB", 4, 1L, 8L)))
  }

  test("keywordTopk: tf/df ranking with token tie-break, short docs emit < k rows") {
    // df: apple 1, banana 2, cherry 1, date 1.
    // doc 1 scores: apple 2/1=2.0, cherry 1/1=1.0, banana 1/2=0.5.
    // doc 2 scores: banana 3/2=1.5, date 1/1=1.0 — only two tokens.
    val dir = writeDocs("kw", Seq(
      (1L, "s", "apple apple banana cherry"),
      (2L, "s", "banana banana banana date")))
    val got = CorpusQueries.keywordTopk(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toList
    assert(got == List(
      (1L, 1, "apple", 2L, 1L, 2.0),
      (1L, 2, "cherry", 1L, 1L, 1.0),
      (1L, 3, "banana", 1L, 2L, 0.5),
      (2L, 1, "banana", 3L, 2L, 1.5),
      (2L, 2, "date", 1L, 1L, 1.0)))
  }

  test("unigramScore: train-tf mass per eval occurrence, OOV counted, floor mean") {
    // train (id 1): "a a b" -> tf: a=2, b=1. Eval docs score per
    // OCCURRENCE: val 90 "a b z" = 2+1+0, one OOV, mean 3 DIV 3 = 1;
    // test 95 "a a a a" = 8, mean 2. Train docs must not appear.
    val dir = writeDocs("unigram", Seq(
      (1L, "s", "a a b"),
      (90L, "s", "a b z"),
      (95L, "s", "a a a a")))
    val got = CorpusQueries.unigramScore(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    assert(got == List(
      (90L, 3L, 3L, 1L, 1L),
      (95L, 4L, 8L, 0L, 2L)))
  }
}
