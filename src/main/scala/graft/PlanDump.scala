package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Per-query formatted-plan dumper for the optimization-round
  * deliverables (`plans/r<n>/<query>_{before,after}.txt`): one file
  * per requested query, `.explain("formatted")` content. Not part of
  * the driver contract.
  *
  * usage: sbt "runMain graft.PlanDump <suffix> <query> [query…]"
  * env:   SPARK_GRAFT_SF_DIR (default sf0.01),
  *        SPARK_GRAFT_PLANS_DIR (default /tmp/plans)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <suffix> <query> [query…]")
    val suffix = args.head
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = Paths.get(sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "/tmp/plans"))
    Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote ${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
