package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** MinHash + LSH near-duplicate detection (SURVEY.md §2.11):
  * shingle → minhash signature → band buckets → candidate join →
  * exact-Jaccard verification.
  *
  * Deterministic by construction: the k permutations are
  * `(a_i·h + b_i) mod p` over a seeded generator, with token hashes
  * reduced mod p = 2^31−1 so every product stays far inside Int64 —
  * no overflow, no platform dependence. All stages are DataFrame ops:
  * the only shuffles are the band-key group and the candidate join,
  * and the verification joins shingle sets back only for candidate
  * pairs (never all pairs) — at 100 TB the candidate set, not |D|²,
  * bounds the cost.
  *
  * The Spark-side token hash is `xxhash64` (codegen'd, built-in). An
  * md5-based variant ([[tokenHashMd5]]) exists so the same pipeline
  * is expressible in the DuckDB oracle (xxhash64 has no DuckDB twin).
  */
object MinHashDedup {

  val prime: Long = 2147483647L // 2^31 - 1 (Mersenne)

  /** Seeded permutation coefficients, identical across engines. */
  def perms(k: Int, seed: Long = 7L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((1L + math.abs(rnd.nextLong()) % (prime - 1),
      math.abs(rnd.nextLong()) % prime))
  }

  /** Fast path token hash: xxhash64 reduced into [0, p). */
  def tokenHashXx(tok: Column): Column =
    pmod(xxhash64(tok), lit(prime))

  /** Oracle-parity token hash: first 15 hex chars of md5 → int → mod p
    * (DuckDB: `CAST('0x'||substr(md5(t),1,15) AS BIGINT) % p`). */
  def tokenHashMd5(tok: Column): Column =
    pmod(conv(substring(md5(tok), 1, 15), 16, 10).cast(LongType), lit(prime))

  /** k-element minhash signature over a document's shingle array. */
  def signature(shingleArr: Column, ps: Seq[(Long, Long)],
      tokenHash: Column => Column): Column = {
    val hashes = transform(shingleArr, tokenHash)
    array(ps.map { case (a, b) =>
      array_min(transform(hashes, h => pmod(h * a + b, lit(prime))))
    }: _*)
  }

  /** Band keys: signature split into `nBands` rows of `r` ints each;
    * docs sharing any whole band are candidates. */
  def explodeBands(df: DataFrame, sigCol: String, nBands: Int, r: Int): DataFrame =
    df.select(col("*"),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"),
          slice(col(sigCol), b * r + 1, r).as("sig_slice"))
      }: _*)).as("band_key"))

  /** Full near-dup pipeline over (idCol, textCol): returns candidate
    * pairs with exact Jaccard over distinct shingles, filtered at
    * `threshold`. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 32, nBands: Int = 8, shingleN: Int = 3,
      threshold: Double = 0.5,
      tokenHash: Column => Column = tokenHashXx): DataFrame = {
    require(k % nBands == 0, "k must divide into bands")
    val r = k / nBands
    val ps = perms(k)
    val sh = docs.select(col(idCol).as("doc_id"),
      TextFunctions.shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = sh.withColumn("sig", signature(col("sh"), ps, tokenHash))
    val banded = explodeBands(sig.select("doc_id", "sig"), "sig", nBands, r)
      .select(col("doc_id"), col("band_key"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact verification on candidates only
    val sets = sh.select(col("doc_id"), col("sh"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("n_common").cast(DoubleType) /
        (size(col("sh_a")) + size(col("sh_b")) - col("n_common")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_common", "jaccard")
  }
}
