package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the payload of the
  * latest right row with the same key and `rightTime <= leftTime`.
  *
  * Implemented with the union+window technique rather than a
  * non-equi join: tag both sides, union them, and carry the most
  * recent right payload forward with `last(_, ignoreNulls)` over a
  * key-partitioned time-ordered window. Cost = ONE shuffle on the key
  * plus a per-partition sort — the same cost class as a sort-merge
  * join, with no range cross-product. At 100 TB this is the plan you
  * want: no broadcast requirement on either side, skew handled by AQE.
  *
  * Rows on the right sharing (key, time) must be pre-deduplicated by
  * the caller if deterministic output is required (the window breaks
  * ties by `rightTieBreak`, keeping the greatest).
  */
object AsOfJoin {
  /** @param left       left relation
    * @param right      right relation
    * @param key        join key column name (same name both sides)
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right
    * @param rightTieBreak column on the right breaking equal-time ties
    *                      (greatest wins)
    * @param payload    right columns to attach to left rows
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightTieBreak: String,
      payload: Seq[String]): DataFrame =
    joinImpl(left, right, key, leftTime, rightTime, rightTieBreak,
      payload, forward = false)

  /** Forward as-of join: the EARLIEST right row with the same key and
    * `rightTime >= leftTime`. Same union+window mechanics as
    * [[backward]], scanning time descending; equal-time right rows
    * resolve to the SMALLEST tiebreak. */
  def forward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightTieBreak: String,
      payload: Seq[String]): DataFrame =
    joinImpl(left, right, key, leftTime, rightTime, rightTieBreak,
      payload, forward = true)

  private def joinImpl(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightTieBreak: String,
      payload: Seq[String], forward: Boolean): DataFrame = {
    val leftCols = left.columns
    // Common layout: key, _t, _side (0=right sorts before 1=left at
    // equal times, so `<=` semantics hold), _tie, _payload, leftCols….
    // Payload travels as ONE struct: the matched right row is carried
    // whole, so a NULL in one of its fields stays NULL (no leakage
    // from an older right row) and no-match is the struct being null.
    // A right row with NULL time can never satisfy the inequality
    // (NULL <= t is never true) — drop it, or its payload would be
    // carried to every left row preceding the first real right row.
    val r = right.filter(col(rightTime).isNotNull).select(
      col(key).as("_k") +: col(rightTime).as("_t") +: lit(0).as("_side") +:
        col(rightTieBreak).as("_tie") +:
        struct(payload.map(col): _*).as("_payload") +:
        leftCols.toSeq.map(c => lit(null).as(c)): _*)
    val l = left.select(
      col(key).as("_k") +: col(leftTime).as("_t") +: lit(1).as("_side") +:
        lit(null).as("_tie") +: lit(null).as("_payload") +:
        leftCols.toSeq.map(c => col(c)): _*)
    // Backward scans time ascending (carry latest past right row);
    // forward scans descending (carry earliest future right row).
    // Either way rights sort before lefts at equal time (inclusive
    // bound), and the desired tiebreak winner is seen LAST so
    // `last(ignoreNulls)` lands on it.
    // NULL left times sort FIRST in both directions so such rows are
    // scanned before any right row and come out with a NULL payload
    // (no match is defined for a NULL time).
    val timeOrd =
      if (forward) col("_t").desc_nulls_first else col("_t").asc_nulls_first
    val tieOrd = if (forward) col("_tie").desc_nulls_last else col("_tie").asc_nulls_last
    val w = Window.partitionBy("_k")
      .orderBy(timeOrd, col("_side").asc, tieOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("_payload", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col).toSeq ++
        payload.map(p => col("_payload").getField(p).as(p)): _*)
  }
}
