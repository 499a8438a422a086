package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Embedding similarity queries over the `embeddings` table
  * (SURVEY.md §2.11). The oracle-checked variants quantize each
  * float to `floor(x*1000)` (exact in both engines: float→double is
  * lossless, ×1000 never lands on an exact .5, floor is exact) so
  * dot products are integer arithmetic and cosines are a fixed tree
  * of IEEE ops — bit-identical between Spark and DuckDB. The
  * double-precision production API is [[graft.operators.Similarity]]
  * (ScalaTest-covered; float sums are order-sensitive so it is not
  * oracle-comparable).
  */
object VectorQueries {

  /** Integer-quantized embedding: ArrayType(LongType). */
  private def quantize(c: Column): Column =
    transform(c, e => floor(e.cast(DoubleType) * 1000).cast(LongType))

  private val quantizeSql =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT))"

  private def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Brute-force k-NN baseline: 8 fixed query vectors against the
    * whole corpus, top-5 by integer dot product. Queries broadcast;
    * corpus scored where it lives; one shuffle (on q_id) to rank. */
  def knnBruteForce(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"))
    val pairs = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("dot", qdot(col("q_qv"), col("qv")))
    val w = Window.partitionBy("q_id").orderBy(col("dot").desc, col("vec_id").asc)
    pairs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("q_id", "rnk", "vec_id", "dot")
      .orderBy("q_id", "rnk")
  }

  val knnBruteForceSql: String =
    s"""WITH e AS (SELECT vec_id, $quantizeSql AS qv FROM embeddings),
       |q AS (SELECT vec_id AS q_id, qv AS q_qv FROM e WHERE vec_id < 8),
       |pairs AS (
       |  SELECT q.q_id, c.vec_id,
       |    (SELECT CAST(SUM(x*y) AS BIGINT)
       |     FROM (SELECT unnest(q.q_qv) x, unnest(c.qv) y)) AS dot
       |  FROM q, e c WHERE c.vec_id <> q.q_id)
       |SELECT q_id, rnk, vec_id, dot FROM (
       |  SELECT q_id, vec_id, dot,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dot DESC, vec_id ASC) AS rnk
       |  FROM pairs)
       |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  /** Embedding-cosine near-dup pairs over a corpus sample: exact
    * quantized cosine (fixed IEEE tree: dot / (sqrt(na)*sqrt(nb))),
    * pairs above threshold. The sample (vec_id % 5 = 0) keeps the
    * oracle's pair count quadratic-small; the production scale path
    * is LSH bucketing ([[graft.operators.Similarity.lshTopK]]). */
  def embedNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("n2", qdot(col("qv"), col("qv")))
    val a = e.select(col("vec_id").as("id_a"), col("qv").as("qv_a"), col("n2").as("n2_a"))
    val b = e.select(col("vec_id").as("id_b"), col("qv").as("qv_b"), col("n2").as("n2_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        qdot(col("qv_a"), col("qv_b")).cast(DoubleType) /
          (sqrt(col("n2_a").cast(DoubleType)) * sqrt(col("n2_b").cast(DoubleType))))
      .filter(col("cosine") >= 0.25)
      .select("id_a", "id_b", "cosine")
      .orderBy("id_a", "id_b")
  }

  val embedNearDupSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, qv,
       |    (SELECT CAST(SUM(x*x) AS BIGINT) FROM (SELECT unnest(qv) x)) AS n2
       |  FROM (SELECT vec_id, $quantizeSql AS qv FROM embeddings
       |        WHERE vec_id % 5 = 0))
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  (SELECT CAST(SUM(x*y) AS BIGINT) FROM (SELECT unnest(a.qv) x, unnest(b.qv) y))
       |    / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cosine
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE (SELECT CAST(SUM(x*y) AS BIGINT) FROM (SELECT unnest(a.qv) x, unnest(b.qv) y))
       |    / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) >= 0.25
       |ORDER BY id_a, id_b""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_knn_bruteforce", knnBruteForce, Some(knnBruteForceSql)),
    QueryDef("q_embed_neardup", embedNearDup, Some(embedNearDupSql)))
}
