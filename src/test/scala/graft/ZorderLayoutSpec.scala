package graft

import java.sql.Timestamp

import graft.queries.AdvancedQueries

/** `q_zorder_layout` semantics: bit-interleaved (custkey, order-day)
  * keys, file bucket = top 4 key bits, and the structural claim the
  * layout exists for — every bucket's min/max rectangle spans at most
  * 1/4 of each dimension's 8-bit grid (512 custkeys × 1024 days).
  */
class ZorderLayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("every bucket is a tight rectangle on the test corpus and rows are conserved") {
    val rows = AdvancedQueries.zorderLayout(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    val orders = Tables.orders(spark, sfDir).count()
    assert(total == orders, "buckets must partition the table exactly")
    for (r <- rows) {
      assert(r.getAs[Long]("span_cust") <= 512,
        s"bucket ${r.get(0)} custkey span ${r.get(8)} exceeds the 4x4 grid cell")
      assert(r.getAs[Long]("span_days") <= 1024,
        s"bucket ${r.get(0)} day span ${r.get(9)} exceeds the 4x4 grid cell")
      assert(r.getAs[Long]("z_min") >= (r.getAs[Long]("file_bucket") << 12))
      assert(r.getAs[Long]("z_max") < ((r.getAs[Long]("file_bucket") + 1) << 12))
    }
  }

  test("planted corners land in the expected grid buckets") {
    val dir = Fixtures.tempDir("zord").toString
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    // (custkey, date) -> hand-computed bucket from the top grid bits:
    // bucket bits [15..12] = [y7, x7, y6, x6] of (xq = custkey>>3, yq = day>>4)
    Seq(
      (1L, 1L, "O", 1.0, ts("1995-01-01"), "p"),    // xq=0,   yq=0   -> bucket 0
      (2L, 1499L, "O", 1.0, ts("2001-08-01"), "p"), // xq=187, yq=150 -> bucket 12
      (3L, 600L, "O", 1.0, ts("1995-02-01"), "p"))  // xq=75,  yq=1   -> bucket 1
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = AdvancedQueries.zorderLayout(spark, dir).collect()
      .map(r => r.getAs[Long]("file_bucket") -> r.getAs[Long]("min_cust")).toMap
    assert(got == Map(0L -> 1L, 12L -> 1499L, 1L -> 600L))
  }
}
