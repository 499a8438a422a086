package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{SimHash, TextFunctions}

/** SimHash near-duplicate detection (SURVEY.md §2.11): one 64-bit
  * signature per document (via the native [[SimHash]] expression),
  * then candidate pairing by 16-bit band equality — by the pigeonhole
  * principle any pair within Hamming distance 3 shares at least one
  * of the 4 bands — and exact Hamming verification with
  * `bit_count(a XOR b)`.
  *
  * Scale shape: signatures are one codegen'd projection (no shuffle);
  * banding explodes ×4; the band equi-join is the only shuffle and
  * joins on a 16-bit key + band index. |candidates| ≪ |D|².
  */
object SimHashDedup {

  /** doc_id + 64-bit simhash signature of word tokens. */
  def signatures(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    SimHash.register(spark)
    docs.select(col(idCol).as("doc_id"),
      call_function("simhash", TextFunctions.wsTokens(col(textCol))).as("sig"))
  }

  /** Pairs within `maxHamming` (≤ 15 for the 4×16-bit band scheme to
    * be lossless... up to 3; above that it is a recall-bounded
    * approximation, as with any LSH). */
  def nearDupPairs(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, maxHamming: Int = 3): DataFrame = {
    val sigs = signatures(spark, docs, idCol, textCol)
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xffffL)).as("bits"))
      }: _*)).as("bk"))
    banded.as("a").join(banded.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
