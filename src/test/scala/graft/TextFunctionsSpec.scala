package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect()(0).getAs[T]("r")

  private def oneSeq(c: org.apache.spark.sql.Column, text: String): List[String] =
    Seq(text).toDF("t").select(c.as("r")).collect()(0).getSeq[String](0).toList

  test("wsTokens splits on runs of whitespace after trim") {
    assert(oneSeq(wsTokens(col("t")), "  a  b\tc ") == List("a", "b", "c"))
  }

  test("tokenCount and bpeishCount") {
    assert(one[Int](tokenCount(col("t")), "the quick, brown fox") == 4)
    // the | quick | , | brown | fox
    assert(one[Int](bpeishCount(col("t")), "the quick, brown fox") == 5)
  }

  test("punctCount counts non-word non-space symbols") {
    assert(one[Int](punctCount(col("t")), "a, b. c!") == 3)
  }

  test("stopwordCount counts exact stopword tokens only") {
    assert(one[Int](stopwordCount(col("t")), "the cat in the hat theory") == 3)
  }

  test("qualityScore is within [0,1] on the corpus") {
    val bad = Tables.documents(spark, sfDir)
      .select(qualityScore(col("text")).as("q"))
      .filter(col("q") < 0 || col("q") > 1)
    assert(bad.count() == 0)
  }

  test("shingles: n-grams of consecutive tokens, distinct, empty when short") {
    assert(oneSeq(shingles(col("t"), 3), "a b c d") == List("a b c", "b c d"))
    assert(oneSeq(shingles(col("t"), 3), "a b") == List())
    // repeated shingle collapses
    assert(oneSeq(shingles(col("t"), 2), "x y x y") == List("x y", "y x"))
  }

  test("langId votes markers with fixed tie priority") {
    assert(one[String](langId(col("t")), "the cat and dog is here") == "en")
    assert(one[String](langId(col("t")), "der hund und die katze ist") == "de")
    assert(one[String](langId(col("t")), "xyz qqq") == "und")
  }

  test("fingerprints are stable hex digests") {
    assert(one[String](fingerprintMd5(col("t")), "hello")
      == "5d41402abc4b2a76b9719d911017c592")
    assert(one[String](fingerprintSha256(col("t")), "hello")
      == "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
  }
}
