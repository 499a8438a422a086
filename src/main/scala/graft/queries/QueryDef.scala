package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the engine's public surface.
  *
  * @param name   stable key (drives `SparkEntry.queries` / `oracleSql`)
  * @param fn     Spark-side implementation; second arg = scale-factor dir
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same
  *               parquet tables; None for non-SQL-expressible operators
  *               (those get a rows-only check and ScalaTest coverage).
  *
  * Oracle-parity rules used across all queries (see SURVEY.md §5.2):
  *  - double aggregates go through DECIMAL casts so both engines do
  *    exact arithmetic (double summation order is engine-dependent);
  *  - final averages are `CAST(dec AS DOUBLE)/COUNT` — one IEEE
  *    division, bit-identical in both engines;
  *  - no raw timestamps in output (events.ts is nanos in parquet:
  *    Spark truncates to micros, DuckDB keeps nanos) — always cast to
  *    DATE or format as string;
  *  - every query ends in a deterministic total ORDER BY; DuckDB sorts
  *    nulls last by default vs Spark first, so oracle SQL spells
  *    NULLS FIRST whenever a sort key is nullable.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
