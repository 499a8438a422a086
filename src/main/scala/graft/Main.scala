package graft

import org.apache.spark.sql.SparkSession

import graft.ingest.{AppConfig, Pipeline}
import graft.util.Log

/** Local/cluster entry point (reference parity: `/root/reference/
  * main.py` — resolve config, invoke the handler once, print the
  * response envelope). Configuration comes entirely from the
  * environment (see [[graft.ingest.AppConfig.resolve]]); exit code is
  * 0 on a 2xx envelope, 1 otherwise, so shell callers and schedulers
  * can branch on the outcome the same way the platform does on a
  * raised error. */
object Main {
  def main(args: Array[String]): Unit = {
    Log.init()
    val resolved = AppConfig.resolve()
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-ingest")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    // Object-store credentials (fs.s3a.*) resolved from env/secret
    // reach the Hadoop FS layer before any path is touched, so a
    // DATA_ROOT like s3a://bucket works end-to-end.
    AppConfig.applyHadoopConf(spark, resolved.hadoopConf)
    // Compute the exit code inside try, stop Spark in finally, and only
    // then exit: System.exit does not unwind the stack, so calling it
    // inside the try would skip `finally spark.stop()` and leave shutdown
    // to Spark's JVM hook.
    val exitCode =
      try {
        val resp = Pipeline.handle(spark, resolved.pipeline)
        println(s"""{"statusCode": ${resp.statusCode}, "body": ${resp.body}}""")
        if (resp.statusCode >= 300) 1 else 0
      } finally spark.stop()
    if (exitCode != 0) sys.exit(exitCode)
  }
}
