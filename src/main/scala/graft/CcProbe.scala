package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Ad-hoc probe (not part of the driver contract): times
  * ConnectedComponents.minLabels against candidate round shapes on the
  * bench sentinel graph (65 536-node chains) and on a near-dup-like
  * blob graph, to decide whether the jump self-join's duplicated
  * `hopped` subtree is worth materializing. Delete-or-keep after the
  * optimization round; findings land in OPTIMIZATION_r19.md. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def chainEdges(n: Long, chainLen: Long): DataFrame = {
      val fwd = spark.range(n)
        .filter(col("id") % chainLen =!= (chainLen - 1))
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint(true)
    }

    // Variant B: identical algorithm, hopped materialized pre-jump.
    def minLabelsB(edges: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
      val mat = operators.Materializer.Local
      var labels = mat(edges.select(col("src").as("node")).distinct()
        .withColumn("label", col("node")))
      var prevSum: java.math.BigDecimal = null
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        val viaEdge = edges.join(labels, col("dst") === col("node"))
          .select(col("src").as("node"), col("label"))
        val hopped = mat(labels.unionByName(viaEdge)
          .groupBy("node").agg(min(col("label")).as("label")))
        val jump = hopped.select(col("node").as("jnode"), col("label").as("jlabel"))
        val next = mat(hopped
          .join(jump, col("label") === col("jnode"))
          .select(col("node"), col("jlabel").as("label")))
        val s = next.agg(sum(col("label").cast(DecimalType(38, 0))).as("s"))
          .collect()(0).getDecimal(0)
        converged = prevSum != null && s.compareTo(prevSum) == 0
        prevSum = s
        labels = next
        iter += 1
      }
      (labels, iter)
    }

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprobe] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val edges = chainEdges(65536L, 64L)
    edges.count()
    // warm codegen
    operators.ConnectedComponents.minLabels(edges)._1.count()
    for (i <- 1 to 3) {
      val (la, ra) = time(s"current#$i") {
        val (l, r) = operators.ConnectedComponents.minLabels(edges); (l.count(), r)
      }
      val (lb, rb) = time(s"matHopped#$i") {
        val (l, r) = minLabelsB(edges); (l.count(), r)
      }
      println(s"[ccprobe] rounds current=$ra matHopped=$rb rows=$la/$lb")
    }
    spark.stop()
  }
}
