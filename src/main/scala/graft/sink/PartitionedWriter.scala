package graft.sink

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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

  /** Z-ORDERED physical layout — the write path `q_zorder_layout`
    * audits: cluster rows along a Morton key
    * ([[graft.functions.ZOrder.zkey]], the SAME definition the audit
    * query uses) with `repartitionByRange` + `sortWithinPartitions`,
    * so every output file's parquet row-group min/max footer is a
    * tight RECTANGLE in both dimensions. A scan filtered on either
    * dimension (or a 2-D box) then skips ~√files at the footer,
    * where a single-column sort helps one dimension and scatters the
    * other — proven by footer inspection in ZorderLayoutSpec and the
    * 2M-row ablation (PLANS.md).
    *
    * Scale shape: the key is map-side codegen'd arithmetic; the only
    * exchange is the range partition (a shuffle any clustered write
    * pays — it IS the layout); the sort is within-partition,
    * spill-safe, never global. At 100 TB this runs per partition/day
    * as the compaction step, not over the whole table at once. */
  def writeZOrdered(df: DataFrame, targetDir: String, zkey: Column,
      nFiles: Int): Unit =
    df.withColumn("__zkey", zkey)
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(targetDir)
}
