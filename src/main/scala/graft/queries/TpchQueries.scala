package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** TPC-H-shaped benchmark queries over the harness star schema
  * (adapted to the available columns; the point is the plan shapes:
  * selective-filter joins, EXISTS, filter-aggregate, join+group+topk).
  * All decimal-exact per the [[QueryDef]] parity rules. */
object TpchQueries {

  private val dec2 = DecimalType(18, 2)
  private val dec42 = DecimalType(4, 2)
  private def disc1 = lit(1).cast(dec42) - col("l_discount").cast(dec42)

  /** Q3-shaped: shipping-priority — revenue of unshipped-late items
    * per order, top 10. Join orders⨝lineitem with selective date
    * filters both sides, group, TakeOrdered. */
  def q3(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate").cast(DateType) < lit("1999-01-01").cast(DateType))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate").cast(DateType) > lit("1999-01-01").cast(DateType))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast(DateType).as("o_date"))
      .agg(sum(col("l_extendedprice").cast(dec2) * disc1).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND CAST(o_orderdate AS DATE) < DATE '1999-01-01'
      |  AND CAST(l_shipdate AS DATE) > DATE '1999-01-01'
      |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
      |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin

  /** Q4-shaped: order-priority checking — orders in a quarter having
    * at least one late lineitem (EXISTS → left-semi join). */
  def q4(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate").cast(DateType) >= lit("1999-01-01").cast(DateType) &&
        col("o_orderdate").cast(DateType) < lit("1999-07-01").cast(DateType))
    val late = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
    ord.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE CAST(o_orderdate AS DATE) >= DATE '1999-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1999-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q6-shaped: forecasting revenue change — pure filter + aggregate,
    * the pushdown/codegen showcase (no joins, no shuffle beyond the
    * single global agg). */
  def q6(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate").cast(DateType) >= lit("1999-01-01").cast(DateType) &&
        col("l_shipdate").cast(DateType) < lit("2000-01-01").cast(DateType) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast(dec2) * col("l_discount").cast(dec42))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n"))

  val q6Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1999-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '2000-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Q10-shaped: returned-item reporting — customer revenue from
    * returned items in a quarter, top 20 customers with nation. */
  def q10(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate").cast(DateType) >= lit("1999-10-01").cast(DateType) &&
        col("o_orderdate").cast(DateType) < lit("2000-01-01").cast(DateType))
    val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
      .agg(sum(col("l_extendedprice").cast(dec2) * disc1).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, n_name, c_acctbal,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND CAST(o_orderdate AS DATE) >= DATE '1999-10-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '2000-01-01'
      |GROUP BY c_custkey, c_name, n_name, c_acctbal
      |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_tpch_q3", q3, Some(q3Sql)),
    QueryDef("q_tpch_q4", q4, Some(q4Sql)),
    QueryDef("q_tpch_q6", q6, Some(q6Sql)),
    QueryDef("q_tpch_q10", q10, Some(q10Sql)))
}
