package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.AsOfJoin

/** The full relational operator surface (SURVEY.md §2.3-§2.8 plus the
  * extension operators of §2.11's "full relational surface" row):
  * joins of every flavor, aggregation variants, window functions,
  * set operations, sorts/top-k. The reference has at most degenerate
  * forms of these (anti-joins on date lists, global max/count); they
  * are first-class here.
  *
  * Parity rules per [[QueryDef]]: DECIMAL-cast before double sums,
  * `CAST(dec AS DOUBLE)` at the edge, dates not timestamps, total
  * ORDER BY everywhere.
  */
object RelationalQueries {

  private val dec2 = DecimalType(18, 2)
  private val dec42 = DecimalType(4, 2)

  /** TPC-H Q1-shaped pricing summary (A-category showcase: hash
    * aggregate with partial/map-side combine; one shuffle on the
    * 2-column group key; all arithmetic decimal-exact). */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate").cast(DateType) <= lit("2001-06-30").cast(DateType))
    val disc1 = lit(1).cast(dec42) - col("l_discount").cast(dec42)
    val tax1 = lit(1).cast(dec42) + col("l_tax").cast(dec42)
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(dec2)).cast(DoubleType).as("sum_qty"),
        sum(col("l_extendedprice").cast(dec2)).cast(DoubleType).as("sum_base_price"),
        sum(col("l_extendedprice").cast(dec2) * disc1).cast(DoubleType).as("sum_disc_price"),
        sum(col("l_extendedprice").cast(dec2) * disc1 * tax1).cast(DoubleType).as("sum_charge"),
        (sum(col("l_quantity").cast(dec2)).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(col("l_extendedprice").cast(dec2)).cast(DoubleType) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) <= DATE '2001-06-30'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q5-shaped multi-join: fact-fact shuffle join on the big
    * side (orders⨝lineitem), broadcast hash joins for the bounded
    * dims (supplier/nation/region). Customer is deliberately NOT
    * hinted: it grows linearly with the dataset (multi-TB at 100 TB),
    * so AQE decides — broadcast at test SF, shuffle at scale. */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate").cast(DateType) >= lit("1998-01-01").cast(DateType) &&
        col("o_orderdate").cast(DateType) < lit("2000-01-01").cast(DateType))
    val li = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir)
    val disc1 = lit(1).cast(dec42) - col("l_discount").cast(dec42)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(col("l_extendedprice").cast(dec2) * disc1).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  val revenueByNationSql: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '2000-01-01'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Inner equi-join (J-category). No broadcast hint: customer grows
    * linearly with the dataset, so a hard hint would pin a driver-OOM
    * plan at 100 TB. AQE picks BroadcastHashJoin at test SF on its
    * own and falls back to a shuffle join at scale. */
  def joinInner(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"),
        col("o_totalprice"))
      .orderBy("o_orderkey")

  val joinInnerSql: String =
    """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  /** Left anti join J1/J2 (`src/s3_processor.py:173-176` semantics:
    * "not in processed set"): customers with no order in 2001+. */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate").cast(DateType) >= lit("2001-01-01").cast(DateType))
    Tables.customer(s, dir)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val antiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND CAST(o_orderdate AS DATE) >= DATE '2001-01-01')
      |ORDER BY c_custkey""".stripMargin

  /** Left semi join (EXISTS): customers with at least one order. */
  def semiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_acctbal")
      .orderBy("c_custkey")

  val semiJoinSql: String =
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Range (band) join: a tiny derived bands relation broadcast
    * against the fact — Spark plans this as a broadcast nested-loop
    * with the band predicate, the right plan when one side is small;
    * no O(n²) shuffle. */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = IngestQueries.events(s, dir)
    val bands = s.range(0, 8).toDF("band_id")
      .select(col("band_id").cast(IntegerType).as("band_id"),
        (col("band_id") * 25.0).as("lo"),
        ((col("band_id") + 1) * 25.0).as("hi"))
    ev.join(broadcast(bands),
        col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("band_id")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec2)).cast(DoubleType).as("sum_value"))
      .orderBy("band_id")
  }

  val rangeJoinSql: String =
    s"""WITH bands AS (
       |  SELECT CAST(band_id AS INTEGER) AS band_id,
       |         band_id * 25.0 AS lo, (band_id + 1) * 25.0 AS hi
       |  FROM (SELECT unnest(generate_series(0, 7)) AS band_id))
       |SELECT band_id, COUNT(*) AS n,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM (${IngestQueries.evSql}) e
       |JOIN bands b ON e.value >= b.lo AND e.value < b.hi
       |GROUP BY band_id ORDER BY band_id""".stripMargin

  /** Batch twin of the stream-stream interval join
    * ([[graft.streaming.IngestStream.intervalJoin]], T-category —
    * previously ScalaTest-only): each click matched to purchases by
    * the same user within 2 hours after it, the same join condition
    * the streaming operator bounds state with (key equality +
    * event-time interval). Batch Catalyst plans it as an equi-join
    * on the key with the interval as a residual filter — one
    * key-partitioned shuffle, no unbounded state. The bound compares
    * epoch micros (exact integers) so the gate is engine-exact. */
  def intervalJoinQ(s: SparkSession, dir: String): DataFrame = {
    val ev = IngestQueries.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_micros(col("ts")).as("click_us"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id").as("b_uid"),
        unix_micros(col("ts")).as("buy_us"))
    clicks.join(buys,
        col("user_id") === col("b_uid") &&
          col("buy_us") >= col("click_us") &&
          col("buy_us") <= col("click_us") + lit(7200000000L))
      .select(col("click_id"), col("buy_id"), col("user_id"),
        (col("buy_us") - col("click_us")).as("gap_us"))
      .orderBy("click_id", "buy_id")
  }

  val intervalJoinSql: String =
    s"""WITH ev AS (${IngestQueries.evSql}),
       |clicks AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_us
       |           FROM ev WHERE event_type = 'click'),
       |buys AS (SELECT event_id AS buy_id, user_id, epoch_us(ts) AS buy_us
       |         FROM ev WHERE event_type = 'purchase')
       |SELECT click_id, buy_id, c.user_id, buy_us - click_us AS gap_us
       |FROM clicks c JOIN buys b ON c.user_id = b.user_id
       |  AND buy_us >= click_us AND buy_us <= click_us + 7200000000
       |ORDER BY click_id, buy_id""".stripMargin

  /** Backward as-of join (union+window implementation, see
    * [[graft.operators.AsOfJoin]]): each event picks up the latest
    * order of the same user placed at-or-before the event. Right side
    * pre-deduplicated per (key, time) so ties are deterministic in
    * both engines. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = IngestQueries.events(s, dir)
      .select("event_id", "user_id", "ts")
    val wDedup = Window.partitionBy("o_custkey", "o_orderdate")
      .orderBy(col("o_orderkey").desc)
    val ord = Tables.orders(s, dir)
      .withColumn("rn", row_number().over(wDedup))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
    AsOfJoin.backward(ev, ord, key = "user_id",
        leftTime = "ts", rightTime = "o_orderdate",
        rightTieBreak = "o_orderkey", payload = Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy("event_id")
  }

  val asofJoinSql: String =
    s"""WITH ev AS (SELECT event_id, user_id, ts FROM (${IngestQueries.evSql})),
       |ord AS (
       |  SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
       |          ORDER BY o_orderkey DESC) AS rn FROM orders)
       |  WHERE rn = 1)
       |SELECT ev.event_id, ev.user_id, ord.o_orderkey, ord.o_totalprice
       |FROM ev ASOF LEFT JOIN ord
       |  ON ev.user_id = ord.user_id AND ord.o_orderdate <= ev.ts
       |ORDER BY ev.event_id""".stripMargin

  /** Forward as-of join: each event picks up the user's EARLIEST
    * order placed at-or-after the event (right side pre-deduplicated
    * per (key, time) to min orderkey for determinism). */
  def asofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = IngestQueries.events(s, dir)
      .select("event_id", "user_id", "ts")
    val wDedup = Window.partitionBy("o_custkey", "o_orderdate")
      .orderBy(col("o_orderkey").asc)
    val ord = Tables.orders(s, dir)
      .withColumn("rn", row_number().over(wDedup))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
    AsOfJoin.forward(ev, ord, key = "user_id",
        leftTime = "ts", rightTime = "o_orderdate",
        rightTieBreak = "o_orderkey", payload = Seq("o_orderkey", "o_totalprice"))
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy("event_id")
  }

  val asofForwardSql: String =
    s"""WITH ev AS (SELECT event_id, user_id, ts FROM (${IngestQueries.evSql})),
       |ord AS (
       |  SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
       |          ORDER BY o_orderkey ASC) AS rn FROM orders)
       |  WHERE rn = 1)
       |SELECT ev.event_id, ev.user_id, ord.o_orderkey, ord.o_totalprice
       |FROM ev ASOF LEFT JOIN ord
       |  ON ev.user_id = ord.user_id AND ord.o_orderdate >= ev.ts
       |ORDER BY ev.event_id""".stripMargin

  /** Global top-k: `TakeOrderedAndProject` — per-partition heaps, no
    * full sort of 100 TB, only k rows to the driver. */
  def topK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  val topKSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** Windowed top-k per group (rank over a deterministic total order). */
  def topKPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rnk")
  }

  val topKPerGroupSql: String =
    """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      |  FROM orders)
      |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin

  /** Running sum (window frame, W-category): cumulative spend per
    * customer in (order date, key) order; decimal-exact running sum. */
  def runningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("od").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("od", col("o_orderdate").cast(DateType))
      .withColumn("running_spend",
        sum(col("o_totalprice").cast(dec2)).over(w).cast(DoubleType))
      .select("o_custkey", "o_orderkey", "od", "running_spend")
      .orderBy("o_custkey", "od", "o_orderkey")
  }

  val runningSumSql: String =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders ORDER BY o_custkey, od, o_orderkey""".stripMargin

  /** lag/lead analytics per user over the event stream. */
  def lagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("event_id").asc)
    IngestQueries.events(s, dir)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("delta", col("value") - col("prev_value"))
      .select("user_id", "event_id", "value", "prev_value", "next_type", "delta")
      .orderBy("user_id", "event_id")
  }

  val lagLeadSql: String =
    s"""SELECT user_id, event_id, value,
       |  LAG(value, 1) OVER w AS prev_value,
       |  LEAD(event_type, 1) OVER w AS next_type,
       |  value - LAG(value, 1) OVER w AS delta
       |FROM (${IngestQueries.evSql})
       |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ASC)
       |ORDER BY user_id, event_id""".stripMargin

  /** UNION + DISTINCT (U1, `src/s3_processor.py:28-37`). */
  def unionDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
      .union(Tables.supplier(s, dir).select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy("nk")

  val unionDistinctSql: String =
    """SELECT c_nationkey AS nk FROM customer
      |UNION SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin

  /** EXCEPT (U2, `src/s3_processor.py:176`): customers who ordered
    * but never with a finalized ('F') order. */
  def exceptOp(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.select(col("o_custkey").as("ck"))
      .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("ck")))
      .orderBy("ck")
  }

  val exceptOpSql: String =
    """SELECT DISTINCT o_custkey AS ck FROM orders
      |EXCEPT SELECT DISTINCT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY ck""".stripMargin

  /** INTERSECT. */
  def intersectOp(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
      .intersect(Tables.supplier(s, dir).select(col("s_nationkey").as("nk")))
      .orderBy("nk")

  val intersectOpSql: String =
    """SELECT c_nationkey AS nk FROM customer
      |INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""".stripMargin

  /** Bag-semantics set ops: UNION ALL / EXCEPT ALL / INTERSECT ALL
    * over order-status multisets (duplicates preserved — the
    * relational ops [[unionDistinct]] etc. do not cover). One scan,
    * one shuffle: each row is tagged with its membership in both
    * sides, per-side multiplicities are aggregated, and the three ALL
    * results are pure multiset arithmetic (`na+nb`, `max(na-nb,0)`,
    * `min(na,nb)`) — vs the naive 3-scan/3-set-op-shuffle plan. */
  def setOpsAll(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderstatus").as("st"),
        // when/otherwise (not a bare cast) so a NULL predicate input
        // counts 0 exactly like the oracle's CASE ... ELSE 0 END
        when(col("o_totalprice") > 200000.0, 1).otherwise(0).as("in_a"),
        when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0).as("in_b"))
      .filter(col("in_a") === 1 || col("in_b") === 1)
      .groupBy("st")
      .agg(sum(col("in_a")).as("na"), sum(col("in_b")).as("nb"))
      .select(col("st"),
        (col("na") + col("nb")).as("n_union_all"),
        greatest(col("na") - col("nb"), lit(0L)).as("n_except_all"),
        least(col("na"), col("nb")).as("n_intersect_all"))
      .orderBy("st")

  val setOpsAllSql: String =
    """SELECT st,
      |  na + nb AS n_union_all,
      |  GREATEST(na - nb, 0) AS n_except_all,
      |  LEAST(na, nb) AS n_intersect_all
      |FROM (
      |  SELECT o_orderstatus AS st,
      |    CAST(SUM(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS nb
      |  FROM orders
      |  WHERE o_totalprice > 200000.0 OR o_orderpriority = '1-URGENT'
      |  GROUP BY o_orderstatus)
      |ORDER BY st""".stripMargin

  /** CUBE aggregation (all 4 grouping combinations in one shuffle). */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(dec2)).cast(DoubleType).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val cubeAggSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** ROLLUP aggregation. */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val rollupAggSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** DISTINCT aggregates (expand + two-phase agg under the hood). */
  def distinctAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n_custs"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(dec2)).cast(DoubleType).as("total"))
      .orderBy("o_orderpriority")

  val distinctAggSql: String =
    """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_custs,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Projection+filter pushdown showcase (P1): `.explain` shows
    * PushedFilters + a 4-column ReadSchema on the parquet scan. */
  def projectionFilter(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate").cast(DateType) >= lit("2000-01-01").cast(DateType))
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  val projectionFilterSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_returnflag = 'R' AND CAST(l_shipdate AS DATE) >= DATE '2000-01-01'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_pricing_summary", pricingSummary, Some(pricingSummarySql)),
    QueryDef("q_revenue_by_nation", revenueByNation, Some(revenueByNationSql)),
    QueryDef("q_join_inner", joinInner, Some(joinInnerSql)),
    QueryDef("q_anti_join", antiJoin, Some(antiJoinSql)),
    QueryDef("q_semi_join", semiJoin, Some(semiJoinSql)),
    QueryDef("q_range_join", rangeJoin, Some(rangeJoinSql)),
    QueryDef("q_interval_join", intervalJoinQ, Some(intervalJoinSql)),
    QueryDef("q_asof_join", asofJoin, Some(asofJoinSql)),
    QueryDef("q_asof_forward", asofForward, Some(asofForwardSql)),
    QueryDef("q_topk", topK, Some(topKSql)),
    QueryDef("q_topk_per_group", topKPerGroup, Some(topKPerGroupSql)),
    QueryDef("q_running_sum", runningSum, Some(runningSumSql)),
    QueryDef("q_lag_lead", lagLead, Some(lagLeadSql)),
    QueryDef("q_union_distinct", unionDistinct, Some(unionDistinctSql)),
    QueryDef("q_except", exceptOp, Some(exceptOpSql)),
    QueryDef("q_intersect", intersectOp, Some(intersectOpSql)),
    QueryDef("q_set_ops_all", setOpsAll, Some(setOpsAllSql)),
    QueryDef("q_cube", cubeAgg, Some(cubeAggSql)),
    QueryDef("q_rollup", rollupAgg, Some(rollupAggSql)),
    QueryDef("q_distinct_agg", distinctAgg, Some(distinctAggSql)),
    QueryDef("q_projection_filter", projectionFilter, Some(projectionFilterSql)))
}
