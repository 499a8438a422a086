package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Date-partitioned parquet layout writer — the engine's native
  * "gold" output mirroring the reference's directory-per-date input
  * convention (SURVEY.md §2.1 S2): one `date=YYYY-MM-DD/` partition
  * directory per day, Hive-style, so downstream reads prune
  * partitions from date predicates (SURVEY.md §4 "partition
  * pruning").
  *
  * Dynamic partition overwrite replaces only the partitions present
  * in the batch — an idempotent per-day commit: re-running a day's
  * ingest rewrites that day's directory and nothing else.
  */
object PartitionedWriter {

  def write(df: DataFrame, targetDir: String, partitionCol: String = "date"): Unit =
    // per-write option, NOT a session conf set: a session-wide
    // "dynamic" leaks into unrelated overwrites that expect static
    // replace-the-table semantics (stale partitions would survive)
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(targetDir)

  def read(spark: SparkSession, targetDir: String): DataFrame =
    spark.read.parquet(targetDir)
}
