package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** The reference pipeline's operator surface re-expressed as pure,
  * oracle-checkable Spark queries over the `events` stream table
  * (`events` ≈ the date-keyed consumption stream: `user_id` ≈
  * `client_id`, `event_type` ≈ `service_name`, `value` ≈ tokens).
  *
  * Operator IDs cite SURVEY.md §2 (which cites the reference by
  * file:line). All queries follow the parity rules in [[QueryDef]].
  */
object IngestQueries {

  /** `events` with the timestamp normalized to micros and an
    * `event_date` column, tolerant of the source's physical type:
    * the harness parquet stores TIMESTAMP(NANOS), which Spark 4
    * refuses to read natively — read nanos as long and truncate
    * with FLOOR division in exact long arithmetic
    * (`(ts - pmod(ts,1000)) div 1000`, never a double round-trip):
    * Spark's bare `div` truncates toward zero while DuckDB's `//`
    * floors, which diverges on pre-1970 (negative-nanos) rows;
    * micro-precision sources (TIMESTAMP / TIMESTAMP_NTZ) pass
    * through, so the same queries run on evolved schemas. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = Tables.events(s, dir)
    val ts = raw.schema("ts").dataType match {
      case LongType =>
        timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000"))
      case _ => col("ts").cast(TimestampType)
    }
    raw.withColumn("ts", ts)
      .withColumn("event_date", to_date(col("ts")))
  }

  /** DuckDB view of the same normalization (micros truncation). */
  val evSql: String =
    "SELECT event_id, make_timestamp(epoch_ns(ts)//1000) AS ts, user_id, " +
      "event_type, value, props, CAST(ts AS DATE) AS event_date FROM events"

  /** Flagship: last-writer-wins keyed upsert (A5/S7/J3) — the
    * reference's `INSERT … ON CONFLICT (date, client_id) DO UPDATE`
    * (`src/db_operations.py:77-91`) as a window-dedup: per
    * `(event_date, user_id)` keep the latest row by ingest order
    * (`event_id`), with the audit column the sink adds.
    * Scale note: one hash-partitioned window over the natural key —
    * a single shuffle, no driver-side state; AQE handles skew.
    */
  def ingestDedup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_date", "user_id")
      .orderBy(col("event_id").desc)
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_date"), col("user_id"), col("event_type"),
        col("value"), lit(true).as("is_active"))
      .orderBy("event_date", "user_id")
  }

  val ingestDedupSql: String =
    s"""SELECT event_date, user_id, event_type, value, TRUE AS is_active
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_date, user_id
       |        ORDER BY event_id DESC) AS rn FROM ($evSql))
       |WHERE rn = 1 ORDER BY event_date, user_id""".stripMargin

  /** Scalar date functions F1-F5: partition-key formatting
    * (`yyyy_MM_dd`, `src/s3_processor.py:31`), +1-day stepping
    * (`:21`), horizon flag (`:179`). */
  def scalarDates(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(
        col("event_id"),
        col("event_date"),
        date_format(col("event_date"), "yyyy_MM_dd").as("partition_key"),
        date_add(col("event_date"), 1).as("next_day"),
        (col("event_date") > lit("2024-06-01").cast(DateType)).as("after_horizon"))
      .orderBy("event_id")

  val scalarDatesSql: String =
    s"""SELECT event_id, event_date,
       |  strftime(event_date, '%Y_%m_%d') AS partition_key,
       |  event_date + 1 AS next_day,
       |  event_date > DATE '2024-06-01' AS after_horizon
       |FROM ($evSql) ORDER BY event_id""".stripMargin

  /** Multi-format date parse P4 (`src/s3_processor.py:94-104`): a
    * fallback chain of `try_to_date` over three formats, exactly the
    * reference's try-dd-MMM-then-generic logic. (The reference's
    * 2-digit `yy` is covered in ScalaTest only: Spark's CORRECTED
    * parser windows `yy` to 2000-2099 while DuckDB's `%y` uses
    * 1969-2068, so the oracle uses 4-digit years.) */
  def multiformatParse(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .withColumn("od", col("o_orderdate").cast(DateType))
    val raw = o.withColumn("raw_str",
      when(col("o_orderkey") % 3 === 0, date_format(col("od"), "dd-MMM-yyyy"))
        .when(col("o_orderkey") % 3 === 1, date_format(col("od"), "yyyy-MM-dd"))
        .otherwise(date_format(col("od"), "yyyy/MM/dd")))
    raw.select(
      col("o_orderkey"),
      col("raw_str"),
      coalesce(
        expr("try_to_timestamp(raw_str, 'dd-MMM-yyyy')"),
        expr("try_to_timestamp(raw_str, 'yyyy-MM-dd')"),
        expr("try_to_timestamp(raw_str, 'yyyy/MM/dd')")).cast(DateType).as("parsed"))
      .orderBy("o_orderkey")
  }

  val multiformatParseSql: String =
    """WITH raw AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 3 = 0
      |           THEN strftime(CAST(o_orderdate AS DATE), '%d-%b-%Y')
      |         WHEN o_orderkey % 3 = 1
      |           THEN strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
      |         ELSE strftime(CAST(o_orderdate AS DATE), '%Y/%m/%d')
      |    END AS raw_str
      |  FROM orders)
      |SELECT o_orderkey, raw_str,
      |  CAST(COALESCE(try_strptime(raw_str, '%d-%b-%Y'),
      |                try_strptime(raw_str, '%Y-%m-%d'),
      |                try_strptime(raw_str, '%Y/%m/%d')) AS DATE) AS parsed
      |FROM raw ORDER BY o_orderkey""".stripMargin

  /** JSON extraction F10 + null-coalesce P3: parse the `props` JSON
    * payload, coerce missing/null to 0 (`src/db_operations.py:90`),
    * aggregate per event_type. */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      // try_cast on BOTH sides: a non-integral value coerces to 0
      // instead of hard-erroring (Spark ANSI cast and DuckDB CAST
      // both throw; TRY_CAST is the null-on-failure twin in each)
      .withColumn("k",
        coalesce(expr("try_cast(get_json_object(props, '$.k') AS BIGINT)"),
          lit(0L)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val jsonExtractSql: String =
    s"""SELECT event_type, COUNT(*) AS n,
       |  CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k
       |FROM (SELECT event_type,
       |        COALESCE(TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT), 0) AS k
       |      FROM ($evSql))
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Checkpoint advance A1/A2/F13 (`src/lambda_handler.py:92-93`,
    * `src/s3_processor.py:122-125`): monotonic max-date fold with
    * guard against a fixed current checkpoint. */
  def checkpointAdvance(s: SparkSession, dir: String): DataFrame = {
    val ckpt = lit("2024-03-01").cast(DateType)
    events(s, dir)
      .agg(max(col("event_date")).as("last_event_date"))
      .select(
        col("last_event_date"),
        greatest(col("last_event_date"), ckpt).as("new_checkpoint"),
        (col("last_event_date") > ckpt).as("advanced"))
  }

  val checkpointAdvanceSql: String =
    s"""SELECT last_event_date,
       |  greatest(last_event_date, DATE '2024-03-01') AS new_checkpoint,
       |  last_event_date > DATE '2024-03-01' AS advanced
       |FROM (SELECT MAX(event_date) AS last_event_date FROM ($evSql))""".stripMargin

  /** Retention horizon P6/T4 (`src/s3_processor.py:179-180`): keep only
    * the 30 days before the stream's high-water mark, daily rollup.
    * The horizon is computed as a broadcast scalar (no driver round
    * trip beyond the 1-row broadcast — scales to any stream length). */
  def retentionWindow(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val mx = ev.agg(max(col("event_date")).as("mx"))
    ev.crossJoin(broadcast(mx))
      .filter(col("event_date") > date_sub(col("mx"), 30))
      .groupBy("event_date")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .orderBy("event_date")
  }

  val retentionWindowSql: String =
    s"""SELECT event_date, COUNT(*) AS n,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
       |FROM ($evSql)
       |WHERE event_date > (SELECT MAX(event_date) FROM ($evSql)) - 30
       |GROUP BY event_date ORDER BY event_date""".stripMargin

  /** Missing-dates discovery S1/U1/J1/U2 (`src/s3_processor.py:21-37`):
    * candidate calendar from min..max via `sequence`+`explode`, minus
    * observed dates via anti-join — the reference's date-range ∪
    * missing-registry probe, relationally. */
  def missingDates(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .filter(col("event_type") === "error" && col("value") > 180)
    val bounds = ev.agg(min(col("event_date")).as("lo"), max(col("event_date")).as("hi"))
    val calendar = bounds
      .select(explode(sequence(col("lo"), col("hi"))).as("event_date"))
    val observed = ev.select("event_date").distinct()
    calendar.join(observed, Seq("event_date"), "left_anti")
      .orderBy("event_date")
  }

  val missingDatesSql: String =
    s"""WITH ev AS (SELECT * FROM ($evSql) WHERE event_type = 'error' AND value > 180),
       |bounds AS (SELECT MIN(event_date) lo, MAX(event_date) hi FROM ev),
       |calendar AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
       |               AS event_date FROM bounds)
       |SELECT event_date FROM calendar c
       |WHERE NOT EXISTS (SELECT 1 FROM ev WHERE ev.event_date = c.event_date)
       |ORDER BY event_date""".stripMargin

  /** String functions F6-F9: key construction (f-string concat,
    * `src/s3_processor.py:43`), predicates (`:59`), trim/split. */
  def stringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        concat(lit("consumption_"), date_format(lit("2024-01-01").cast(DateType), "yyyy_MM_dd"),
          lit("/"), col("c_name"), lit(".csv")).as("object_key"),
        upper(col("c_mktsegment")).as("segment_uc"),
        length(col("c_name")).as("name_len"),
        col("c_name").endsWith(".csv").as("is_csv"),
        col("c_name").contains("Customer").as("has_tag"),
        size(split(trim(col("c_name")), "#")).as("n_parts"))
      .orderBy("c_custkey")

  val stringFuncsSql: String =
    """SELECT c_custkey,
      |  'consumption_' || strftime(DATE '2024-01-01', '%Y_%m_%d') || '/' || c_name || '.csv' AS object_key,
      |  upper(c_mktsegment) AS segment_uc,
      |  CAST(length(c_name) AS INTEGER) AS name_len,
      |  suffix(c_name, '.csv') AS is_csv,
      |  contains(c_name, 'Customer') AS has_tag,
      |  CAST(len(string_split(trim(c_name), '#')) AS INTEGER) AS n_parts
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Control-file serialization F9 (`'\n'.join`, `src/s3_processor
    * .py:183`): the missing-dates list as its newline-joined wire
    * format (sorted for determinism — `collect_list` order is not). */
  def serializeRegistry(s: SparkSession, dir: String): DataFrame =
    missingDates(s, dir)
      .agg(
        concat_ws("\n",
          array_sort(collect_list(date_format(col("event_date"), "yyyy_MM_dd"))))
          .as("registry_body"),
        count(lit(1)).as("n_missing"))

  val serializeRegistrySql: String =
    s"""WITH missing AS ($missingDatesSql)
       |SELECT COALESCE(string_agg(strftime(event_date, '%Y_%m_%d'), chr(10)
       |         ORDER BY event_date), '') AS registry_body,
       |  COUNT(*) AS n_missing
       |FROM missing""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_serialize_registry", serializeRegistry, Some(serializeRegistrySql)),
    QueryDef("q_ingest_dedup", ingestDedup, Some(ingestDedupSql)),
    QueryDef("q_scalar_dates", scalarDates, Some(scalarDatesSql)),
    QueryDef("q_multiformat_parse", multiformatParse, Some(multiformatParseSql)),
    QueryDef("q_json_extract", jsonExtract, Some(jsonExtractSql)),
    QueryDef("q_checkpoint_advance", checkpointAdvance, Some(checkpointAdvanceSql)),
    QueryDef("q_retention_window", retentionWindow, Some(retentionWindowSql)),
    QueryDef("q_missing_dates", missingDates, Some(missingDatesSql)),
    QueryDef("q_string_funcs", stringFuncs, Some(stringFuncsSql)))
}
