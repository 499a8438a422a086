package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{MinHashDedup, SimHashDedup}

/** Sketch-based near-dup operators as driver-visible queries.
  *
  * `q_dedup_minhash` is fully oracle-checked: the Spark pipeline and
  * the generated DuckDB SQL share the same permutation constants and
  * the same md5-derived token hash, so signatures, band collisions,
  * candidates and Jaccard scores are identical integers/doubles in
  * both engines. `q_dedup_simhash` uses the native [[graft.functions.SimHash]]
  * codegen expression (FNV-1a has no cheap DuckDB twin) → rows-only
  * driver check + ScalaTest.
  */
object DedupQueries {

  private val K = 24
  private val Bands = 8
  private val R = K / Bands
  private val Threshold = 0.2
  private val MaxBucket = 200
  private val ps = MinHashDedup.perms(K)

  def minhashQ(s: SparkSession, dir: String): DataFrame =
    MinHashDedup.nearDupPairs(Tables.documents(s, dir), "doc_id", "text",
        k = K, nBands = Bands, shingleN = 3, threshold = Threshold,
        tokenHash = MinHashDedup.tokenHashMd5, maxBucket = MaxBucket)
      .orderBy("doc_a", "doc_b")

  /** DuckDB oracle generated from the same constants. */
  def minhashSql: String = {
    val p = MinHashDedup.prime
    val minExprs = ps.map { case (a, b) => s"MIN((h*$a+$b)%$p)" }.mkString(", ")
    val bandSelects = (0 until Bands).map { b =>
      val lo = b * R + 1
      val hi = b * R + R
      s"SELECT doc_id, $b AS band, sig[$lo:$hi] AS sl FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t) - 1),
       |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
       |  FROM toks WHERE len(t) >= 3),
       |hs AS (
       |  SELECT doc_id, CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) % $p AS h
       |  FROM sh),
       |sig AS (SELECT doc_id, [$minExprs] AS sig FROM hs GROUP BY doc_id),
       |banded AS ($bandSelects),
       |kept AS (
       |  SELECT * FROM banded
       |  QUALIFY COUNT(*) OVER (PARTITION BY band, sl) <= $MaxBucket),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM kept a JOIN kept b
       |    ON a.band = b.band AND a.sl = b.sl AND a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list(DISTINCT sh) AS sl FROM sh GROUP BY doc_id)
       |SELECT doc_a, doc_b,
       |  CAST(len(list_intersect(sa.sl, sb.sl)) AS INTEGER) AS n_common,
       |  CAST(len(list_intersect(sa.sl, sb.sl)) AS DOUBLE)
       |    / CAST(len(sa.sl) + len(sb.sl) - len(list_intersect(sa.sl, sb.sl)) AS DOUBLE) AS jaccard
       |FROM cand
       |JOIN sets sa ON sa.doc_id = doc_a
       |JOIN sets sb ON sb.doc_id = doc_b
       |WHERE CAST(len(list_intersect(sa.sl, sb.sl)) AS DOUBLE)
       |    / CAST(len(sa.sl) + len(sb.sl) - len(list_intersect(sa.sl, sb.sl)) AS DOUBLE) >= $Threshold
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** SimHash near-dup pairs (rows-only check; exactness covered in
    * ScalaTest with planted near-duplicates). Hamming ≤ 12 on random
    * same-vocabulary docs keeps the result non-trivial. */
  def simhashQ(s: SparkSession, dir: String): DataFrame =
    SimHashDedup.nearDupPairs(s, Tables.documents(s, dir), "doc_id", "text",
        maxHamming = 12)
      .orderBy("doc_a", "doc_b")

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_dedup_minhash", minhashQ, Some(minhashSql)),
    QueryDef("q_dedup_simhash", simhashQ, None))
}
