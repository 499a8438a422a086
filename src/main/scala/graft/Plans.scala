package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug._

/** Dumps formatted physical plans for the headline queries (scale
  * audit: pushdown, broadcast choice, shuffle count, codegen spans).
  * Output feeds PLANS.md. Not part of the driver contract. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = sys.env.getOrElse("SPARK_GRAFT_PLANS_OUT", "/tmp/plans.txt")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val picks = Seq(
      "q_projection_filter", "q_pricing_summary", "q_revenue_by_nation",
      "q_topk", "q_ingest_dedup", "q_asof_join", "q_dedup_minhash",
      "q_knn_bruteforce", "q_sessionize",
      "q_set_ops_all", "q_embed_neardup", "q_ann_lsh", "q_ann_ivf",
      "q_tpch_q12", "q_tpch_q14", "q_tpch_q15", "q_tpch_q18", "q_tpch_q19",
      // the r6 de-hinted customer joins: the plan must show the
      // optimizer (size stats / AQE) choosing BroadcastHashJoin at
      // test SF with no hint in the query
      "q_join_inner", "q_interval_join", "q_tpch_q3", "q_tpch_q5",
      "q_tpch_q7", "q_tpch_q8", "q_tpch_q10", "q_tpch_q11",
      // r7 additions: horizon-scalar broadcast + key window; drop-list
      // projection over the components labels
      "q_watermark_dedup", "q_dedup_droplist")
    val sb = new StringBuilder
    for (name <- picks) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"==================== $name ====================\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"plans written to $out")
    spark.stop()
  }
}
