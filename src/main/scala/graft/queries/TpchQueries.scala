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
      .join(cust, col("o_custkey") === col("c_custkey"))
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
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
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

  /** Q12-shaped: shipping-priority classification — lineitems shipped
    * more than 60 days after their order date ("late"), split into
    * high/low order-priority counts per line status. The schema has no
    * l_shipmode/l_receiptdate, so lateness is day-diff shipdate vs
    * orderdate (exact integer arithmetic both engines). One fact-fact
    * join + one tiny aggregation. */
  def q12(s: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("l_shipdate").cast(DateType),
        col("o_orderdate").cast(DateType)) > 60)
      .groupBy("l_linestatus")
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  val q12Sql: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Q14-shaped: promotion-effect — % of one month's revenue from
    * PROMO-type parts. Decimal-exact sums; the final percentage is the
    * identical IEEE tree `100.0 * dbl / dbl` in both engines. The
    * part join is a plain equi-join (AQE broadcasts at small SF; at
    * 100 TB part scales with SF and shuffles — never hinted). */
  def q14(s: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice").cast(dec2) * disc1
    val zero = lit(0).cast(DecimalType(23, 4))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate").cast(DateType) >= lit("1999-09-01").cast(DateType) &&
        col("l_shipdate").cast(DateType) < lit("1999-10-01").cast(DateType))
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(zero))
          .cast(DoubleType) / sum(rev).cast(DoubleType)).as("promo_revenue_pct"),
        count(lit(1)).as("n"))
  }

  val q14Sql: String =
    """SELECT
      |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |      ELSE CAST(0 AS DECIMAL(23,4)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
      |    AS promo_revenue_pct,
      |  COUNT(*) AS n
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1999-09-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1999-10-01'""".stripMargin

  /** Q15-shaped: top supplier — the supplier(s) with maximum revenue
    * in a quarter. The max is selected by EXACT decimal equality (both
    * engines sum the same decimals; no double compare), then the
    * 100-row supplier dim is broadcast. Two aggregations, one of which
    * reduces to a scalar that AQE folds into a broadcast. */
  def q15(s: SparkSession, dir: String): DataFrame = {
    // Eager checkpoint of the per-supplier aggregate (one row per
    // supplier — tiny next to lineitem): `rev` feeds BOTH the max
    // selection and the final join, and without a barrier each consumer
    // re-runs the filtered lineitem scan+agg (the same two-consumer
    // recompute that made set-ops triple-scan in round 1). One fact
    // scan, then both consumers read the materialized aggregate.
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate").cast(DateType) >= lit("1999-01-01").cast(DateType) &&
        col("l_shipdate").cast(DateType) < lit("1999-04-01").cast(DateType))
      .groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice").cast(dec2) * disc1).as("tr"))
      .localCheckpoint(true)
    val maxRev = rev.agg(max(col("tr")).as("tr_max"))
    rev.join(broadcast(maxRev), col("tr") === col("tr_max"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("tr").cast(DoubleType).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q15Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS tr
      |  FROM lineitem
      |  WHERE CAST(l_shipdate AS DATE) >= DATE '1999-01-01'
      |    AND CAST(l_shipdate AS DATE) < DATE '1999-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(tr AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE tr = (SELECT MAX(tr) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** Q18-shaped: large-volume customers — orders whose total quantity
    * exceeds 180 (sum over integral-valued doubles, cast to decimal so
    * the aggregation is exact/order-insensitive), with customer and
    * order header. Aggregate-then-join: the HAVING prunes before the
    * orders join; customer is unhinted (linear-growth table — AQE
    * broadcasts at test SF, shuffles at 100 TB). */
  def q18(s: SparkSession, dir: String): DataFrame = {
    val dq = DecimalType(12, 2)
    val big = Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast(dq)).as("total_qty"))
      .filter(col("total_qty") > 180)
    big.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast(DateType).as("o_date"), col("o_totalprice"),
        col("total_qty").cast(DoubleType).as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey").asc)
  }

  val q18Sql: String =
    """WITH big AS (
      |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 180)
      |SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
      |  o_totalprice, CAST(total_qty AS DOUBLE) AS total_qty
      |FROM big JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey ASC""".stripMargin

  /** Q19-shaped: discounted revenue over a disjunction of brand /
    * size / quantity windows — the OR-of-ANDs predicate-pushdown
    * showcase: the part-side conjuncts (brand, size) and the lineitem
    * quantity bounds each push to their scan; the join key is the only
    * non-pushable term. */
  def q19(s: SparkSession, dir: String): DataFrame = {
    val m = (col("p_brand") === "Brand#15" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 20) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#9" && col("p_size").between(1, 25) &&
        col("l_quantity").between(20, 30))
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .filter(m)
      .agg(sum(col("l_extendedprice").cast(dec2) * disc1).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n"))
  }

  val q19Sql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#9' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_tpch_q3", q3, Some(q3Sql)),
    QueryDef("q_tpch_q4", q4, Some(q4Sql)),
    QueryDef("q_tpch_q6", q6, Some(q6Sql)),
    QueryDef("q_tpch_q10", q10, Some(q10Sql)),
    QueryDef("q_tpch_q12", q12, Some(q12Sql)),
    QueryDef("q_tpch_q14", q14, Some(q14Sql)),
    QueryDef("q_tpch_q15", q15, Some(q15Sql)),
    QueryDef("q_tpch_q18", q18, Some(q18Sql)),
    QueryDef("q_tpch_q19", q19, Some(q19Sql)))
}
