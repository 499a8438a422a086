package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Consumption

/** Keyed last-writer-wins upsert sink (SURVEY.md §2.1 S7, §2.4 A5,
  * §2.9 T5): the reference's `INSERT … ON CONFLICT (date, client_id)
  * DO UPDATE` re-expressed relationally.
  *
  * Target is a parquet table swapped atomically per merge (write to a
  * `_tmp` dir, then rename). That makes every merge idempotent: the
  * streaming `foreachBatch` retry of a failed micro-batch converges to
  * the same state — the standard Spark exactly-once-sink recipe. On a
  * real deployment the same `merge` body targets Delta/Iceberg
  * `MERGE INTO` or a JDBC batched upsert; the windowed-dedup
  * semantics (and its tests) stay identical.
  *
  * Audit semantics (`src/db_operations.py:77-91`): `created_at` is
  * preserved from the first insert of a key, `updated_at` reflects
  * the merge that last touched it, `is_active` is true.
  */
final class UpsertSink(spark: SparkSession, targetDir: String) {

  private def fs = new Path(targetDir).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(targetDir))

  /** Current table state (empty, correctly-typed frame when absent). */
  def read(): DataFrame =
    if (exists) spark.read.parquet(targetDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Consumption.sinkSchema)

  /** A5: deterministic last-writer-wins within a batch: one row per
    * key, greatest `orderCol` wins (never `dropDuplicates`, which is
    * order-nondeterministic — SURVEY.md §7.5). */
  def dedupBatch(batch: DataFrame, orderCol: String): DataFrame = {
    val w = Window.partitionBy(Consumption.key.map(col): _*)
      .orderBy(col(orderCol).desc)
    batch.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Merge a (pre-deduplicated) batch: batch rows beat existing rows
    * per key; `created_at` keeps the oldest value seen for the key.
    * One window over the union — a single shuffle on the natural key. */
  def merge(batch: DataFrame): Long = {
    val now = current_timestamp()
    val incoming = batch
      .select(Consumption.schema.fieldNames.map(col): _*)
      .withColumn("created_at", now)
      .withColumn("updated_at", now)
      .withColumn("is_active", lit(true))
      .withColumn("_src", lit(1))
    val existing = read().withColumn("_src", lit(0))
    val w = Window.partitionBy(Consumption.key.map(col): _*)
      .orderBy(col("_src").desc)
    val wAll = Window.partitionBy(Consumption.key.map(col): _*)
    val merged = existing.unionByName(incoming)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_created", min(col("created_at")).over(wAll))
      .filter(col("_rn") === 1)
      .withColumn("created_at", col("_created"))
      .drop("_rn", "_src", "_created")
    swapWrite(merged)
  }

  /** Write to `_tmp`, swap into place. Count is taken from the
    * written files (one extra metadata-only read, no recompute). */
  private def swapWrite(df: DataFrame): Long = {
    val tmp = targetDir + "_tmp"
    df.write.mode("overwrite").parquet(tmp)
    val target = new Path(targetDir)
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(new Path(tmp), target)
    spark.read.parquet(targetDir).count()
  }
}
