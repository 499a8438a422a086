package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Consumption

/** Validated CSV read + parse for consumption files (SURVEY.md
  * §2.1 S4, §2.2 P1-P5).
  *
  * Split into explicit, separately-testable stages mirroring the
  * reference's behavior:
  *  - read: header'd, all-string CSV. With no explicit schema every
  *    field parses as a string, so there are no type-level corrupt
  *    records at this stage — a short row null-pads, a long row
  *    truncates (same as pandas' tolerant read the reference relies
  *    on, `src/s3_processor.py:108-110`); an UNREADABLE file (I/O)
  *    throws and skips the file's date (E1/E3 in Pipeline). Malformed
  *    VALUES are handled semantically downstream: bad dates drop in
  *    [[ingest]]'s null filter, bad token counts coerce to 0;
  *  - validate: reject a file whose header lacks expected columns
  *    (`src/db_operations.py:68-72`) — the file fails, not the row;
  *  - parse: multi-format date chain (`dd-MMM-yy` first, then ISO,
  *    then slash — `src/s3_processor.py:94-104`) and null→0 token
  *    coercion (`src/db_operations.py:90`).
  */
object CsvIngest {

  final case class SchemaViolation(missing: Seq[String])
    extends RuntimeException(s"missing expected columns: ${missing.mkString(", ")}")

  /** Read raw: header-driven, all strings. Column presence is checked
    * against the actual header (a second schema-only peek would cost
    * a listing at scale; here the header IS the schema since we read
    * with header=true and no explicit schema). */
  def readRaw(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .csv(paths: _*)

  /** P2: fail the file when expected columns are missing. */
  def validateColumns(df: DataFrame): DataFrame = {
    val missing = Consumption.expectedColumns.filterNot(df.columns.contains)
    if (missing.nonEmpty) throw SchemaViolation(missing)
    df
  }

  /** P4: the reference's try-dd-MMM-first parse chain, null on miss. */
  def parseDate(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(
      call_function("try_to_timestamp", c, lit("dd-MMM-yy")),
      call_function("try_to_timestamp", c, lit("yyyy-MM-dd")),
      call_function("try_to_timestamp", c, lit("yyyy/MM/dd"))).cast(DateType)

  /** P1/P3/P4: project to the expected 5 columns with typed values;
    * `extra` columns (e.g. a provenance struct) pass through as-is. */
  def parse(df: DataFrame, extra: Seq[String] = Nil): DataFrame =
    validateColumns(df).select(
      parseDate(col("date")).as("date") +:
      col("client_id") +:
      col("client_name") +:
      col("service_name") +:
      coalesce(expr("try_cast(total_consumed_tokens AS BIGINT)"), lit(0L))
        .as("total_consumed_tokens") +:
      extra.map(col): _*)

  /** Full stage: read, validate, parse, drop rows with an unparseable
    * key (date null after all formats — the reference leaves them as
    * strings with a warning and they then fail the SQL insert; here
    * the row is filtered, the file continues). */
  def ingest(spark: SparkSession, paths: Seq[String]): DataFrame =
    parse(readRaw(spark, paths)).filter(col("date").isNotNull)

  /** As [[ingest]], plus a `_file_order` provenance column
    * (modification time, then path — the reference's `last_modified`
    * tiebreak, `src/s3_processor.py:65` — then position WITHIN the
    * file) for deterministic last-writer-wins across AND within files
    * of one batch. The reference iterates a file's rows in order and
    * later upserts overwrite, so the file's last duplicate wins; the
    * in-file position (`monotonically_increasing_id` taken at the
    * scan, before any shuffle) reproduces that — exact when a file
    * maps to one split (every fixture and any sanely-sized CSV), and
    * stable for a fixed `maxPartitionBytes` otherwise. */
  def ingestWithProvenance(spark: SparkSession, paths: Seq[String]): DataFrame =
    parse(
      readRaw(spark, paths).withColumn("_file_order",
        struct(
          col("_metadata").getField("file_modification_time").as("mtime"),
          col("_metadata").getField("file_path").as("path"),
          monotonically_increasing_id().as("pos"))),
      extra = Seq("_file_order"))
      .filter(col("date").isNotNull)
}
