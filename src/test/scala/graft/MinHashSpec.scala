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

  test("incrementalPairs finds an exact dup across the batch/index boundary") {
    // Index docs 0..39 + planted dups 100..102; the "arriving batch"
    // is an exact copy of doc 5 plus one unrelated doc. The copy has
    // an identical shingle set → identical signature → every band
    // collides and all components match (n_match = k, est_jaccard 1).
    val k = 24
    val ps = MinHashDedup.perms(k)
    def sigsOf(df: org.apache.spark.sql.DataFrame) =
      MinHashDedup.signaturesAgg(
        graft.functions.TextFunctions.shingleSets(df, "doc_id", "text", 3),
        ps, MinHashDedup.tokenHashMd5)
    val copyOf5 = docs.filter($"doc_id" === 5L).head().getString(1)
    val batch = Seq(
      (1000L, copyOf5),
      (1001L, "completely unrelated stray tokens nothing shared here at all"))
      .toDF("doc_id", "text")
    val got = MinHashDedup.incrementalPairs(sigsOf(batch), sigsOf(docs),
        k = k, nBands = 8, minMatch = 8, maxBucket = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.exists(_ == ((1000L, 5L, k, 1.0))), s"exact dup not found: ${got.toList}")
    assert(got.forall(_._1 >= 1000L), "pair roles reversed: new_doc must come from the batch")
    assert(!got.exists(_._1 == 1001L), "unrelated batch doc matched the index")
  }
}
