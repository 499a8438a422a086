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
  * single-key case). Write-to-tmp + swap keeps the operation
  * idempotent and crash-safe (same recipe as [[UpsertSink]]).
  */
object Compactor {

  def fileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
  }

  /** Rewrite `dir` into ~targetRowsPerFile-row files; `clusterBy`
    * sorts within partitions for stats-based pruning. Returns the new
    * file count. */
  def compact(spark: SparkSession, dir: String, targetRowsPerFile: Long,
      clusterBy: Seq[String] = Nil): Int = {
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    val arranged =
      if (clusterBy.nonEmpty)
        df.repartitionByRange(nFiles, clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*)
      else df.repartition(nFiles)
    val tmp = dir + "_compact_tmp"
    arranged.write.mode("overwrite").parquet(tmp)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    fs.rename(new Path(tmp), p)
    fileCount(spark, dir)
  }
}
