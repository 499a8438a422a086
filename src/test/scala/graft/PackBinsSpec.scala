package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokenCount
import graft.queries.TextQueries

/** `packBins` semantics: the closed-form streaming packing
  * `bin = floor(exclusive_cumsum(tokens) / 512)` per Knuth-hash shard.
  * The crafted fixture exploits 2654435761 ≡ 1 (mod 16), so for
  * doc_id < 1e8 the shard is simply `doc_id % 16` — letting the test
  * place documents in chosen shards without reproducing the hash. */
class PackBinsSpec extends SparkTestBase {
  import spark.implicits._

  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  test("crafted corpus: straddle stays in its first-token bin, oversize doc skips bins, shards pack independently") {
    val dir = Fixtures.tempDir("packbins").toString
    // shard 0 (doc_id % 16 == 0): token counts 500, 100, 1200, 10, 2.
    // Exclusive cumsums 0, 500, 600, 1800, 1810 → bins 0, 0, 1, 3, 3:
    // the 100-token doc straddles the 512 boundary but stays in bin 0
    // (fill 600/512 > 1), the 1200-token doc spans bins 1-3 so bin 2
    // has no first token and is ABSENT, and the tail lands in bin 3.
    // shard 1: one 5-token doc — its cumsum restarts at 0.
    val docs = Seq(
      (0L, 500), (16L, 100), (32L, 1200), (48L, 10), (64L, 2),
      (1L, 5))
    docs.map { case (id, n) => (id, words(n), "en", "crafted", n * 2 - 1) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = TextQueries.packBins(spark, dir)
      .select("shard", "bin", "n_docs", "n_tokens", "first_doc", "fill")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toList

    assert(got == List(
      (0L, 0L, 2L, 600L, 0L, 600.0 / 512),
      (0L, 1L, 1L, 1200L, 32L, 1200.0 / 512),
      (0L, 3L, 2L, 12L, 48L, 12.0 / 512),
      (1L, 0L, 1L, 5L, 1L, 5.0 / 512)))
  }

  test("corpus conservation: every doc and every token lands in exactly one bin") {
    val bins = TextQueries.packBins(spark, sfDir)
      .agg(sum("n_docs").as("d"), sum("n_tokens").as("t"))
      .collect()(0)
    val corpus = Tables.documents(spark, sfDir)
      .agg(count(lit(1)).as("d"),
        sum(tokenCount(col("text")).cast("long")).as("t"))
      .collect()(0)
    assert(bins.getLong(0) == corpus.getLong(0))
    assert(bins.getLong(1) == corpus.getLong(1))
  }
}
