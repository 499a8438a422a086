package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.{SimHash, Trigrams}

/** Raw-SQL entry point: registers every test table as a temp view and
  * the engine's custom functions (`simhash`, `trigrams`) in the
  * session registry, then hands the string to Catalyst. A user of the
  * reference (or of any SQL engine) can run plain SQL against the
  * same relations the DataFrame surface uses.
  */
object Sql {

  /** Register custom scalar functions once per session. */
  def registerFunctions(spark: SparkSession): Unit = {
    SimHash.register(spark)
    Trigrams.register(spark)
  }

  /** Register all tables of a scale-factor dir as temp views. The
    * events table registers in its micro-normalized form (its parquet
    * is TIMESTAMP(NANOS), unreadable raw by Spark 4 — see
    * [[graft.queries.IngestQueries.events]]). */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach {
      case "events" =>
        graft.queries.IngestQueries.events(spark, sfDir)
          .drop("event_date").createOrReplaceTempView("events")
      case n =>
        Tables.load(spark, sfDir, n).createOrReplaceTempView(n)
    }

  def run(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    registerFunctions(spark)
    registerTables(spark, sfDir)
    spark.sql(sql)
  }
}
