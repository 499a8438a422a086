package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AdvancedQueries, AnalyticsQueries, CorpusQueries, CurationQueries, DedupQueries, IngestQueries, QueryDef, RelationalQueries, TextQueries, TpchQueries, TpchQueries2, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-area registries; every entry
  * with SQL-expressible semantics also appears in `oracleSql` for the
  * driver's DuckDB hash-compare (SURVEY.md §5.2).
  */
object SparkEntry {

  /** All query definitions, one per implemented operator (SURVEY.md §2). */
  def defs: Seq[QueryDef] =
    IngestQueries.all ++ RelationalQueries.all ++ TextQueries.all ++
      CorpusQueries.all ++ CurationQueries.all ++ VectorQueries.all ++ DedupQueries.all ++
      AnalyticsQueries.all ++ AdvancedQueries.all ++ TpchQueries.all ++
      TpchQueries2.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core computation: keyed last-writer-wins ingest
    * (SURVEY.md §7.3). */
  def entry(spark: SparkSession): DataFrame =
    IngestQueries.ingestDedup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys = non-SQL-expressible ops
    * (rows-only check + ScalaTest coverage). */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
