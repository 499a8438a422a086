package graft.model

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.types._

/** The consumption fact table (SURVEY.md §1.1): input schema is the
  * CSV header (reference `sample_data/consumption_2025_05_01.csv:1`,
  * validated at `src/db_operations.py:65`), output schema adds the
  * audit columns of the upsert sink (`src/db_operations.py:77-84`).
  */
final case class Consumption(
    date: Date,
    client_id: String,
    client_name: String,
    service_name: String,
    total_consumed_tokens: Long)

final case class ConsumptionRecord(
    date: Date,
    client_id: String,
    client_name: String,
    service_name: String,
    total_consumed_tokens: Long,
    created_at: Timestamp,
    updated_at: Timestamp,
    is_active: Boolean)

object Consumption {
  /** Expected CSV columns (`src/db_operations.py:65`). */
  val expectedColumns: Seq[String] = Seq(
    "date", "client_id", "client_name", "service_name", "total_consumed_tokens")

  /** Raw read schema: everything as string; parsing/coercion is an
    * explicit, testable step (never `inferSchema` at scale —
    * SURVEY.md §1.3). Used by the streaming source, which requires an
    * explicit schema; the batch path reads header-driven so column
    * validation can reject files with missing columns (P2). */
  val rawSchema: StructType = StructType(
    expectedColumns.map(StructField(_, StringType)))

  /** Parsed schema (SURVEY.md §1.2 type table). */
  val schema: StructType = StructType(Seq(
    StructField("date", DateType),
    StructField("client_id", StringType),
    StructField("client_name", StringType),
    StructField("service_name", StringType),
    StructField("total_consumed_tokens", LongType)))

  /** Sink schema = parsed + audit columns (`FIXTURES.md` §5). */
  val sinkSchema: StructType = StructType(schema.fields ++ Seq(
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("is_active", BooleanType)))

  /** Upsert conflict key (`src/db_operations.py:80`). */
  val key: Seq[String] = Seq("date", "client_id")
}
