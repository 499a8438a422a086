package graft

import org.apache.spark.sql.functions.{col, collect_set}

import graft.functions.TextFunctions.shingleRows
import graft.queries.TextQueries

/** Prefix-filter (PPJoin/AllPairs) exactness: the whole point of the
  * operator is that it finds EVERY pair with Jaccard ≥ 0.7 — no df
  * cap, no hash recall loss. The spec brute-forces all pairs over the
  * sf0.001 corpus's shingle sets and demands set equality, which
  * exercises both directions: no missed pair (prefix completeness +
  * length filter correct) and no extra pair (verification exact). */
class PpjoinSpec extends SparkTestBase {

  test("q_dedup_ppjoin == brute-force all-pairs Jaccard >= 0.7 at sf0.001") {
    val sets = shingleRows(Tables.documents(spark, sfDir), "doc_id", "text")
      .select("doc_id", "sh").distinct()
      .groupBy("doc_id").agg(collect_set(col("sh")).as("shs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .sortBy(_._1)
    val expected = (for {
      i <- sets.indices.iterator
      j <- (i + 1) until sets.length
      (a, sa) = sets(i); (b, sb) = sets(j)
      n = (sa & sb).size
      u = sa.size + sb.size - n
      if u > 0 && 10L * n >= 7L * u
    } yield (a, b, n.toLong)).toSet
    assert(expected.nonEmpty, "fixture has no >=0.7 pairs; test is vacuous")
    val got = TextQueries.dedupPpjoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("prefix index excludes the hottest shingles: corpus-hot grams generate no candidates") {
    // A doc whose every shingle is corpus-hot has a prefix drawn from
    // the LEAST hot of them; two docs that only share boilerplate
    // (low jaccard) must not surface. Planted: 60% shared boilerplate
    // (J ~= 0.43 < 0.7) -> excluded; 80% overlap (J ~= 2/3)... also
    // excluded; >= 0.7 requires sharing ~82% of the union.
    import spark.implicits._
    val boiler = (1 to 30).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, boiler + " " + (1 to 20).map(i => s"x$i").mkString(" ")),
      (2L, boiler + " " + (1 to 20).map(i => s"y$i").mkString(" ")),
      (3L, boiler + " " + (1 to 2).map(i => s"z$i").mkString(" ")),
      (4L, boiler + " " + (1 to 2).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")))
    val dir = Fixtures.tempDir("ppjoin-hot").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.dedupPpjoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // docs 3 and 4: 30 boilerplate tokens + 2 unique -> shingle sets
    // differ only in the last ~4 grams -> J >= 0.7 -> MUST be found;
    // docs 1-2 share only the boilerplate block -> J < 0.7 -> absent.
    assert(got.exists { case (a, b, _) => a == 3L && b == 4L })
    assert(!got.exists { case (a, b, _) => a == 1L && b == 2L })
    for ((_, _, j) <- got) assert(j >= 0.7 - 1e-9)
  }
}
