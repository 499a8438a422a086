package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.AdvancedQueries
import graft.sink.PartitionedWriter

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

  /** Per-row-group ((min, max), (min, max)) of TWO INT64 columns
    * across every parquet file under `dir` — read from the REAL file
    * footers, the exact metadata a parquet scan's row-group skipping
    * consults, both columns from ONE footer pass per file (a
    * positional zip of two listings would pair stats across files on
    * any FS whose listing order is not stable). */
  private def rowGroupStats(dir: String, colA: String,
      colB: String): Seq[((Long, Long), (Long, Long))] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
    files.flatMap { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try r.getFooter.getBlocks.asScala.map { b =>
        def mm(column: String): (Long, Long) = {
          val st = b.getColumns.asScala
            .find(_.getPath.toDotString == column).get.getStatistics
          (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
        }
        (mm(colA), mm(colB))
      }.toSeq
      finally r.close()
    }
  }

  private def overlapping(stats: Seq[((Long, Long), (Long, Long))],
      cust: (Long, Long), day: (Long, Long)): Int =
    stats.count { case ((cMin, cMax), (dMin, dMax)) =>
      cMax >= cust._1 && cMin <= cust._2 && dMax >= day._1 && dMin <= day._2
    }

  test("writeZOrdered: row-group footers form 2-D rectangles a box predicate skips; " +
      "a single-column sort cannot") {
    val base = Fixtures.tempDir("zwrite")
    // synthetic corpus domains: custkey 0..149, orderdate 1995-01-01
    // .. 2001-08-01 → day ∈ [0, ~2405] against the layout anchor
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey").cast("long").as("o_custkey"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).cast("long").as("day"))
      .localCheckpoint(true)
    val nFiles = 16
    val zdir = base.resolve("zorder").toString
    PartitionedWriter.writeZOrdered(orders, zdir,
      graft.functions.ZOrder.zkey(col("o_custkey"), 3, col("day"), 4, 8), nFiles)
    // the straw man: same file count, clustered on custkey alone
    val sdir = base.resolve("sorted").toString
    orders.repartitionByRange(nFiles, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(sdir)
    // rows conserved, bit-for-bit
    def keyset(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(keyset(spark.read.parquet(zdir)) === keyset(orders))
    def stats(dir: String) = rowGroupStats(dir, "o_custkey", "day")
    val zStats = stats(zdir)
    val sStats = stats(sdir)
    assert(zStats.size >= nFiles && sStats.size >= nFiles)
    val custAll = (Long.MinValue, Long.MaxValue)
    // day-only box (first ~256 days): the custkey sort scatters day —
    // EVERY row group overlaps; the z-order layout confines it to the
    // curve's y<256 cells
    val zDay = overlapping(zStats, custAll, (0L, 255L))
    val sDay = overlapping(sStats, custAll, (0L, 255L))
    assert(sDay >= sStats.size - 1, s"custkey sort should not prune a day box (overlap $sDay)")
    assert(zDay * 2 < sDay, s"z-order must at least halve the day-box scan ($zDay vs $sDay)")
    // 2-D box (half the custkey domain × ~1/5 of the day domain):
    // z-order prunes on BOTH dimensions, the sort on one
    val box = ((0L, 74L), (0L, 511L))
    val z2 = overlapping(zStats, box._1, box._2)
    val s2 = overlapping(sStats, box._1, box._2)
    assert(z2 < s2, s"z-order 2-D box overlap $z2 must beat single-sort $s2")
    // and the skipped layout still answers the query correctly
    val zAns = spark.read.parquet(zdir)
      .filter(col("o_custkey") <= 74 && col("day") <= 511)
      .collect().map(_.getLong(0)).sorted.toSeq
    val direct = orders
      .filter(col("o_custkey") <= 74 && col("day") <= 511)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(zAns === direct)
    info(s"row groups scanned for day-only box: zorder $zDay/${zStats.size}, " +
      s"custkey-sort $sDay/${sStats.size}; 2-D box: zorder $z2, sort $s2")
  }
}
