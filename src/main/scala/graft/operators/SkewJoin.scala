package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual salting for skewed equi-joins (SURVEY.md §2.11 scale
  * toolbox; AQE's skew-join handles sort-merge skew automatically,
  * but salting remains the lever when the skew is in an aggregation
  * or AQE can't see the hot key, e.g. streaming state).
  *
  * Left (large, skewed) rows get a deterministic salt in [0, n);
  * right (small) rows are replicated once per salt. The join key
  * becomes (key, salt): one hot key's rows spread over n partitions.
  */
object SkewJoin {

  /** Deterministic per-row salt: hash of the whole left row mod n —
    * stable across retries (no rand()), uniform enough to split a
    * hot key.
    *
    * Only left-preserving join types are accepted: the right side is
    * replicated once per salt, so right_outer/full_outer would emit
    * every unmatched right ROW once per salt (n spurious null-padded
    * rows) — replicate the LEFT side instead if the right side must
    * be preserved. */
  def salted(left: DataFrame, right: DataFrame, key: String, nSalts: Int,
      joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace("_", "")),
      s"salted join replicates the right side; '$joinType' would emit " +
        "unmatched right rows once per salt — use a left-preserving type")
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(nSalts)).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(array((0 until nSalts).map(lit): _*)))
    saltedLeft.join(saltedRight, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Salted aggregation: two-phase group-by for hot grouping keys —
    * partial aggregate on (key, salt), final on key. For algebraic
    * aggregates this is exactly Spark's partial/final split, made
    * explicit so the partial runs at a configurable fan-out. */
  def saltedCount(df: DataFrame, key: String, nSalts: Int): DataFrame =
    df.withColumn("_salt",
        pmod(xxhash64(struct(df.columns.map(col): _*)), lit(nSalts)).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n"))
}
