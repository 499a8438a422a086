package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sink.Scd2Sink

/** Streaming SCD2 maintenance: a change-event stream folded into the
  * [[graft.sink.Scd2Sink]] history table via `foreachBatch` — the
  * same "tiny transactional merge per micro-batch" shape as
  * [[IngestStream.startUpsert]], with the sink's late-event
  * quarantine routed to a durable late-registry.
  *
  * Exactly-once story, piece by piece:
  *  - the MERGE is idempotent under micro-batch replay by the sink's
  *    contract (replayed events match existing version rows or
  *    compress away — `Scd2SinkSpec`), so the crash window between
  *    sink commit and checkpoint commit re-applies harmlessly;
  *  - the LATE quarantine is an append-like effect, so it is written
  *    `partitionBy(batch_id)` with dynamic partition overwrite — a
  *    replayed batch OVERWRITES its own partition instead of
  *    double-appending (the idempotent-append recipe).
  *
  * At scale this is the standard dimension-maintenance topology: the
  * stream stays tiny (changes, not facts), each micro-batch rewrites
  * only the key-buckets it touches, and consumers read a consistent
  * SCD2 table that a batch rebuild (`q_scd2_history`) can audit at
  * any time. */
object Scd2Stream {

  /** Start an AvailableNow fold of `events` (streaming frame with
    * columns `key, attr, eff_date, seq`) into the SCD2 table at
    * `targetDir`; late events land under
    * `lateDir/batch_id=<n>/`. */
  def start(spark: SparkSession, events: DataFrame, targetDir: String,
      lateDir: String, checkpointDir: String): StreamingQuery = {
    val sink = new Scd2Sink(spark, targetDir)
    events.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val late = sink.applyBatch(batch)
          if (!late.isEmpty)
            late.withColumn("batch_id", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id").parquet(lateDir)
        }
        ()
      }
      .start()
  }

  /** The accumulated quarantine (empty, correctly-typed when none). */
  def lateRegistry(spark: SparkSession, lateDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(lateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(lateDir)
    else spark.range(0).select(
      col("id").as("key"), lit("").as("attr"),
      lit(null).cast("date").as("eff_date"), lit("").as("reason"),
      lit(0L).as("batch_id")).limit(0)
  }
}
