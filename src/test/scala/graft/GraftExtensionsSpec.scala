package graft

import org.apache.spark.sql.SparkSession

/** The SparkSessionExtensions hook must make every native function
  * SQL-callable with no Scala-side registration. A fresh SparkSession
  * (same SparkContext) is built with the extension installed; the
  * shared test session is restored afterwards. */
class GraftExtensionsSpec extends SparkTestBase {

  test("extension installs native functions for pure-SQL use") {
    spark.sparkContext // ensure shared context exists
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      val row = s.sql(
        """SELECT simhash(split('the quick brown fox', ' ')) AS sh,
          |  trigrams('abcd') AS tg,
          |  dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS dl,
          |  dot_double(array(0.5D, 2.0D), array(4.0D, 0.25D)) AS dd,
          |  lsh_band_keys(array(7L, -3L, 11L), 2, 4) AS keys""".stripMargin)
        .collect()(0)
      assert(row.getSeq[String](row.fieldIndex("tg")).toList == List("abc", "bcd"))
      assert(row.getAs[Long]("dl") == 4L + 10L + 18L)
      assert(row.getAs[Double]("dd") == 2.5)
      assert(row.getSeq[Long](row.fieldIndex("keys")).length == 2)
      // same value the programmatic path computes
      val viaApi = {
        import org.apache.spark.sql.functions._
        graft.functions.SimHash.simhash(s, split(lit("the quick brown fox"), " "))
      }
      assert(s.range(1).select(viaApi).collect()(0).getLong(0) ==
        row.getAs[Long]("sh"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }
}
