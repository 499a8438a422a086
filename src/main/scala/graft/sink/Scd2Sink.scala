package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SCD2 (Kimball type-2) keyed history sink: where [[UpsertSink]]
  * overwrites a key's row (the reference's `ON CONFLICT DO UPDATE`,
  * `src/db_operations.py:77-84`), this sink CLOSES the current
  * version (`valid_to` = the change date) and appends a new open one
  * — the dimension keeps its full change history, the pattern a
  * training-data pipeline needs for source registries and label
  * versions ("which quality label did this source carry when the
  * 2024-03 snapshot was built?").
  *
  * State schema: `(key, attr, valid_from, valid_to, version)` with
  * exactly one open row (`valid_to IS NULL`) per key — the same
  * frame `q_scd2_history` derives from a full event log, and the
  * sink spec's core property is rebuild == incremental.
  *
  * Merge semantics per batch event `(key, attr, eff_date, seq)`:
  *  - `eff_date` past the key's frontier (its open version's
  *    `valid_from`) → applied; an unchanged attr compresses away
  *    (run-length semantics, so replaying a batch is a no-op).
  *  - an event whose attr equals the attr IN EFFECT at its
  *    eff_date (the version row with valid_from <= eff_date <
  *    valid_to, open row unbounded) → silently dropped. This is the
  *    idempotent-retry contract (foreachBatch), and it is wider than
  *    exact version-row replay on purpose: an event that was
  *    accepted but COMPRESSED AWAY (attr unchanged) leaves no
  *    version row, yet its replay must still be a no-op — it
  *    compresses away in the full-log rebuild too, so dropping it
  *    preserves rebuild == incremental.
  *  - anything else at or behind the frontier → returned in the
  *    `late` frame, NOT applied — rewriting closed history from
  *    compressed state is ambiguous (a late event may re-establish
  *    an attr run the compression already erased), so late changes
  *    route to the caller's late-registry (the reference's S6/S9
  *    shape) for an explicit key rebuild from the raw log.
  *
  * Scale shape: state is hash-bucketed on the key
  * (`bucket = pmod(xxhash64(key), 64)`, Hive layout); a merge reads
  * and rewrites ONLY buckets containing batch keys via dynamic
  * partition overwrite — cost follows the batch's key spread, not
  * table size (the [[UpsertSink]] date-pruning argument, re-keyed).
  * Recompression windows partition by key — no global sort anywhere.
  * On Delta/Iceberg the same merge body becomes `MERGE INTO` with a
  * close-and-insert WHEN MATCHED pair; the semantics and spec stay.
  *
  * Durability limitation (plain parquet, no table format): the
  * dynamic partition overwrite commits touched buckets ONE AT A
  * TIME — a crash mid-write can leave mixed-generation state (some
  * buckets merged, others stale). That is exactly the atomicity gap
  * a transactional table format closes (the Delta/Iceberg MERGE
  * INTO remark above); until then, recovery is re-running the batch
  * — safe because the merge is idempotent per the no-op rules, so a
  * replay completes the partially-applied generation without
  * double-applying the already-merged buckets.
  */
final class Scd2Sink(spark: SparkSession, targetDir: String,
    nBuckets: Int = 64) {

  private val schema = StructType(Seq(
    StructField("key", LongType),
    StructField("attr", StringType),
    StructField("valid_from", DateType),
    StructField("valid_to", DateType),
    StructField("version", IntegerType)))

  private def fs = new Path(targetDir).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(targetDir))

  /** Current history (empty, correctly-typed frame when absent). */
  def read(): DataFrame =
    if (exists)
      spark.read.parquet(targetDir)
        .select(schema.fieldNames.map(col): _*)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Run-length compress a change-event frame
    * `(key, attr, valid_from)` into SCD2 rows — the exact logic of
    * `q_scd2_history`, shared so sink and query cannot drift. Caller
    * guarantees at most one event per (key, valid_from). */
  private def compress(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("key").orderBy("valid_from")
    events
      .withColumn("_prev", lag(col("attr"), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col("attr"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("version", row_number().over(w))
      .select(schema.fieldNames.map(col): _*)
  }

  /** Apply one batch of change events `(key, attr, eff_date, seq)`;
    * `seq` resolves same-(key, eff_date) collisions (greatest wins,
    * skew-immune max_by). Returns the late/rejected events
    * `(key, attr, eff_date, reason)` — empty on a clean merge. */
  def applyBatch(batch: DataFrame): DataFrame = {
    val b = batch
      .groupBy(col("key"), col("eff_date").cast(DateType).as("eff_date"))
      .agg(max_by(col("attr"), col("seq")).as("attr"))
      .persist()
    try {
      val touchedBuckets = b
        .select(pmod(xxhash64(col("key")), lit(nBuckets)).as("bucket"))
        .distinct().collect().map(_.getLong(0))
      if (touchedBuckets.isEmpty)
        return b.limit(0).select(col("key"), col("attr"), col("eff_date"),
          lit("").as("reason"))
      // Bucket-pruned slice of the table: batch keys hash into these
      // buckets by construction, so frontiers and replay detection
      // need nothing outside it. Eager localCheckpoint severs every
      // downstream frame's lineage from the files the dynamic
      // overwrite below replaces (the UpsertSink self-overwrite note)
      // — `accepted`, `late`, and `merged` all read THIS
      // materialization, never the live directory.
      val existingTouched = readBucketed()
        .filter(col("bucket").isin(touchedBuckets.toIndexedSeq: _*))
        .localCheckpoint(true)
      val frontier = existingTouched.groupBy("key")
        .agg(max(col("valid_from")).as("_frontier"))
      // Replay detection, generalized past exact version-row matches:
      // an event is a silent no-op when its attr equals the attr IN
      // EFFECT at its eff_date (version row with valid_from <=
      // eff_date < valid_to, open row = no upper bound). This covers
      // the event that was ACCEPTED but compressed away (attr
      // unchanged) on the first run — it left no version row, so an
      // exact-row check would misfile its replay as 'behind_frontier'
      // once a later event in the same batch advanced the frontier.
      // Dropping it is safe for rebuild == incremental: the same
      // event compresses away in the full-log rebuild too (its
      // lag(attr) equals its attr). Key-equi join + range filter; the
      // per-key version count bounds the fan-out.
      val inEffect = existingTouched.select(col("key"),
        col("attr").as("_eff_attr"), col("valid_from").as("_vf"),
        col("valid_to").as("_vt"))
      val noop = b.join(inEffect, Seq("key"))
        .filter(col("_vf") <= col("eff_date") &&
          (col("_vt").isNull || col("eff_date") < col("_vt")) &&
          col("attr") === col("_eff_attr"))
        .select(col("key"), col("eff_date"), col("attr"), lit(1).as("_noop"))
        .distinct()
      val cls = b
        .join(frontier, Seq("key"), "left")
        .join(noop, Seq("key", "eff_date", "attr"), "left")
      val accepted = cls
        .filter(col("_frontier").isNull || col("eff_date") > col("_frontier"))
        .select(col("key"), col("attr"), col("eff_date").as("valid_from"))
      val late = cls
        .filter(col("_frontier").isNotNull &&
          col("eff_date") <= col("_frontier") && col("_noop").isNull)
        .select(col("key"), col("attr"), col("eff_date"),
          lit("behind_frontier").as("reason"))
        .localCheckpoint(true)
      val events = existingTouched
        .select(col("key"), col("attr"), col("valid_from"))
        .unionByName(accepted)
      val merged = compress(events)
        .withColumn("bucket", pmod(xxhash64(col("key")), lit(nBuckets)))
      merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(targetDir)
      late
    } finally { b.unpersist(); () }
  }

  private def readBucketed(): DataFrame =
    if (exists)
      spark.read.parquet(targetDir)
        .select((schema.fieldNames :+ "bucket").map(col): _*)
    else read().withColumn("bucket",
      pmod(xxhash64(col("key")), lit(nBuckets)))
}
