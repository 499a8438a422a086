package graft

import graft.operators.MinHashDedup

class MinHashSpec extends SparkTestBase {
  import spark.implicits._

  private val vocab = Array("spark", "query", "join", "scan", "filter", "agg",
    "window", "sort", "merge", "hash", "batch", "stream", "row", "column")

  /** 40 random docs + 3 planted near-duplicate pairs (one-word edits). */
  private lazy val docs = {
    val rnd = new scala.util.Random(11)
    def text() = Seq.fill(60)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (0 until 40).map(i => (i.toLong, text()))
    val dups = (0 until 3).map { i =>
      val orig = base(i)._2.split(" ")
      orig(17) = "edited"
      (100L + i, orig.mkString(" "))
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  test("planted near-duplicates are found with high jaccard") {
    val pairs = MinHashDedup.nearDupPairs(docs, "doc_id", "text",
        k = 32, nBands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 3)
      assert(pairs.contains((i.toLong, 100L + i)), s"missing planted pair $i")
  }

  test("verification filters false band collisions below threshold") {
    val out = MinHashDedup.nearDupPairs(docs, "doc_id", "text",
      k = 32, nBands = 16, threshold = 0.5).collect()
    // every reported pair really is >= threshold by exact jaccard
    assert(out.forall(_.getDouble(3) >= 0.5))
    // random 60-token docs over a 14-word vocab don't reach 0.5 jaccard
    assert(out.length == 3)
  }

  test("signature is deterministic across runs and hash variants differ") {
    val s1 = MinHashDedup.nearDupPairs(docs, "doc_id", "text", k = 16,
      nBands = 8, threshold = 0.5).collect().toSet
    val s2 = MinHashDedup.nearDupPairs(docs, "doc_id", "text", k = 16,
      nBands = 8, threshold = 0.5).collect().toSet
    assert(s1 == s2)
    val md5Variant = MinHashDedup.nearDupPairs(docs, "doc_id", "text", k = 16,
      nBands = 8, threshold = 0.5,
      tokenHash = MinHashDedup.tokenHashMd5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 3)
      assert(md5Variant.contains((i.toLong, 100L + i)))
  }
}
