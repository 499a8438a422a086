package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction — the unglamorous operator every 100 TB
  * ingest pipeline needs: incremental loads (one file per day per
  * trigger) accumulate small parquet files; scans then pay per-file
  * open/footer costs and lose vectorization efficiency.
  *
  * `compact` rewrites a directory to ⌈rows/targetRowsPerFile⌉ files,
  * optionally sort-clustered so parquet row-group min/max statistics
  * become selective for the cluster keys (poor-man's Z-order for the
  * single-key case). The swap renames the live directory ASIDE before
  * renaming the rewrite in, then deletes the backup — a crash at any
  * point leaves either the old or the new table recoverable (no
  * delete-before-rename window where neither exists). Note renames are
  * atomic on HDFS/local fs; on an object store, pair this with a
  * version-pointer (manifest) layout instead.
  */
object Compactor {

  /** Data-file count, recursing into partition directories. */
  def fileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }

  /** Rewrite `dir` into ~targetRowsPerFile-row files; `clusterBy`
    * sorts within partitions for stats-based pruning; `partitionBy`
    * MUST name the table's Hive partition columns when the directory
    * is partitioned — a flat rewrite would collapse `col=value/`
    * directories into plain files and break the layout (and any
    * later dynamic-partition merge into it). Returns the new file
    * count. */
  def compact(spark: SparkSession, dir: String, targetRowsPerFile: Long,
      clusterBy: Seq[String] = Nil, partitionBy: Seq[String] = Nil): Int = {
    val df = spark.read.parquet(dir)
    require(partitionBy.forall(df.columns.contains),
      s"partitionBy ${partitionBy.mkString(",")} not all present in table")
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    val arranged =
      if (clusterBy.nonEmpty)
        df.repartitionByRange(nFiles, clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*)
      else if (partitionBy.nonEmpty)
        df.repartition(nFiles, partitionBy.map(col): _*)
      else df.repartition(nFiles)
    val tmp = dir + "_compact_tmp"
    val writer = arranged.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(tmp)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bak = new Path(dir + "_compact_bak")
    if (fs.exists(bak)) fs.delete(bak, true) // stale backup from a prior crash
    if (!fs.rename(p, bak))
      sys.error(s"compact: cannot move $p aside")
    if (!fs.rename(new Path(tmp), p)) { // restore the original on failure
      fs.rename(bak, p)
      sys.error(s"compact: swap failed for $p; original restored")
    }
    fs.delete(bak, true)
    fileCount(spark, dir)
  }
}
