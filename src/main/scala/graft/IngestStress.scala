package graft

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

import graft.ingest.Pipeline

/** Ingest-throughput probe (not part of the driver contract): run the
  * full batch pipeline (discover → validated parse → window dedup →
  * keyed upsert merge) over a generated 1M-row consumption day and
  * report rows/s — the direct comparison point to the reference's
  * one-SQL-round-trip-per-row sink (BASELINE.md "Sink write pattern").
  * usage: put csv day dirs under $SPARK_GRAFT_INGEST_DIR/data first.
  */
object IngestStress {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_INGEST_DIR", "/tmp/ingest_stress")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = Pipeline.Config(
      prefix = s"$base/data",
      checkpointDir = s"$base/ckpt",
      registryDir = s"$base/registry",
      targetDir = s"$base/table",
      defaultDate = "2025_04_30",
      today = LocalDate.parse("2025-05-02"))
    val t0 = System.nanoTime()
    val r = Pipeline.run(spark, cfg)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[ingest] ${r.message}; table rows=${r.rowsInTable}; " +
      f"wall=${secs}%.2f s; throughput=${r.rowsInTable / secs}%.0f upserted rows/s")
    spark.stop()
  }
}
