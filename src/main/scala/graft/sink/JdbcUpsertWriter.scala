package graft.sink

import org.apache.spark.sql.{DataFrame, Row}

import graft.model.Consumption

/** The reference's Postgres sink (SURVEY.md §2.1 S7) done right:
  * batched `INSERT … ON CONFLICT (date, client_id) DO UPDATE`
  * statements per partition — versus the reference's one network
  * round-trip per row (`src/db_operations.py:75-91`, see BASELINE.md
  * "Sink write pattern").
  *
  * The statement executor is injected so the writer is testable
  * without a database (the container has none) and swappable for a
  * real `java.sql.Connection` pool in production. Executors run on
  * the EXECUTORS (inside `foreachPartition`), so the factory must be
  * serializable — exactly the foreachBatch JDBC recipe.
  */
/** Connection coordinates for the reference's Postgres sink
  * (`/root/reference/src/lambda_handler.py:50-66` `DB_CONFIG` dict);
  * resolved by [[graft.ingest.AppConfig]] from env vars or a secret
  * JSON document. `toString` masks the password so the config can be
  * logged safely. */
final case class DbConfig(
    dbname: String,
    user: String,
    password: String,
    host: String,
    port: Int) {
  def jdbcUrl: String = s"jdbc:postgresql://$host:$port/$dbname"
  override def toString: String =
    s"DbConfig($dbname,$user,****,$host,$port)"
}

object JdbcUpsertWriter {

  val upsertSql: String =
    """INSERT INTO consumptions
      |  (date, client_id, client_name, service_name, total_consumed_tokens,
      |   created_at, updated_at, is_active)
      |VALUES (?, ?, ?, ?, ?, NOW(), NOW(), TRUE)
      |ON CONFLICT (date, client_id) DO UPDATE SET
      |  client_name = EXCLUDED.client_name,
      |  service_name = EXCLUDED.service_name,
      |  total_consumed_tokens = EXCLUDED.total_consumed_tokens,
      |  updated_at = NOW()""".stripMargin

  /** One batch of bind-parameter rows (maps 1:1 to an addBatch /
    * executeBatch round-trip). */
  final case class Batch(statements: Seq[Seq[Any]])

  /** Write `df` (already deduplicated per key — see
    * [[UpsertSink.dedupBatch]]) through the executor in batches of
    * `batchSize` rows per round-trip. Returns rows written. */
  def write(df: DataFrame, execute: Batch => Unit, batchSize: Int = 500): Long = {
    val cols = Consumption.expectedColumns
    val written = df.sparkSession.sparkContext.longAccumulator("jdbc_rows")
    df.select(cols.head, cols.tail: _*).foreachPartition { (rows: Iterator[Row]) =>
      rows.grouped(batchSize).foreach { group =>
        val binds = group.map(r => cols.map(c => r.getAs[Any](c)))
        execute(Batch(binds))
        written.add(group.size.toLong)
      }
    }
    written.value
  }
}
