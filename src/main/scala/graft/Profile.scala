package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc performance probe (not part of the driver contract):
  * time + explain any registered query by name.
  *
  * usage: sbt "runMain graft.Profile q_dedup_minhash [q_other…]"
  * env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_EXPLAIN=1
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    Tables.lineitem(spark, sfDir).count() // warm the reader path
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted}"))
      // two timed runs: first includes codegen/JIT, second is steady-state
      for (round <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[prof] $name%-28s run$round rows=$n%-9d ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
