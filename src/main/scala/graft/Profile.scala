package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.MinHashDedup

/** Ad-hoc performance probe (not part of the driver contract). */
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

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warmup
    Tables.lineitem(spark, sfDir).count()

    val docs = Tables.documents(spark, sfDir)
    val docSets = docs
      .select(col("doc_id"), TextFunctions.shingles(col("text"), 3).as("shs"))
      .withColumn("sz", size(col("shs")))
      .filter(col("sz") > 0)
    time("docSets")(println("  n=" + docSets.count()))
    val exploded = docSets.select(col("sz"), col("doc_id"),
      explode(col("shs")).as("sh"))
    time("exploded")(println("  n=" + exploded.count()))
    val grouped = exploded.groupBy("sh")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sz")))).as("ds"))
      .filter(size(col("ds")) <= 50)
    time("grouped")(println("  n=" + grouped.count()))
    val pairs = grouped.select(explode(
      flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + lit(2), size(col("ds")) - i - 1), y =>
          struct(x.getField("doc_id").as("doc_a"), y.getField("doc_id").as("doc_b"),
            x.getField("sz").as("sz_a"), y.getField("sz").as("sz_b")))))).as("p"))
    time("pairs explode")(println("  n=" + pairs.count()))
    time("full jaccard")(println("  out=" +
      graft.queries.TextQueries.dedupNgramJaccard(spark, sfDir).count()))

    val sh = docs.select(col("doc_id"),
      TextFunctions.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = MinHashDedup.signaturesAgg(sh, MinHashDedup.perms(24),
      MinHashDedup.tokenHashMd5)
    time("signatures md5")(println("  n=" + sig.count()))
    time("full minhash")(println("  out=" +
      graft.queries.DedupQueries.minhashQ(spark, sfDir).count()))
    spark.stop()
  }
}
