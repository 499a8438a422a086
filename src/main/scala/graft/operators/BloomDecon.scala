package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtering for decontamination-shaped joins, built
  * on Spark's OWN runtime-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the codegen'd
  * expressions behind `spark.sql.optimizer.runtime.bloomFilter`),
  * surfaced as a first-class operator: Catalyst's automatic runtime
  * filter only fires on shuffle-join patterns it can prove; a
  * decontamination pass KNOWS its small side (the eval/benchmark gram
  * set) and can install the filter deliberately.
  *
  * Scale shape — the whole point at 100 TB: the exact-join
  * decontamination scan shuffles EVERY distinct corpus gram to the
  * join (the corpus side is the 100 TB side). With a bloom built over
  * the eval grams (the small side, a few MB of bits regardless of
  * corpus size) and broadcast into a corpus-side `might_contain`
  * FILTER, the non-colliding mass — in practice ~all of the corpus —
  * is dropped MAP-SIDE before the distinct/shuffle/join; only true
  * hits plus the bloom's false-positive mass pay the shuffle. The
  * bloom guarantees NO false negatives, so a downstream exact join on
  * the survivors returns bit-identical results to the pure exact
  * plan — correctness never depends on the filter (false positives
  * are verified away; the bloom only prunes).
  *
  * Both sides hash with `xxhash64` (seed 42 — the same hashing
  * Spark's `InjectRuntimeFilter` uses), so build and probe agree for
  * any input type.
  */
object BloomDecon {

  private val log = graft.util.Log("graft.operators.BloomDecon")

  /** Sizing defaults (re-sized r19): 1M bits = 125 KB serialized —
    * optimal-k false-positive rate ~1e-9 at 3×10⁴ items and < 2% at
    * 10⁵ items, the documented eval-SUITE gram scale this operator
    * filters against (the eval side is small by construction; the
    * corpus side never touches the bits). The previous 8M-bit/1 MB
    * default rode along as a plan LITERAL in every task binary
    * ("Broadcasting large task binary … 1107 KiB" in the bench logs)
    * and zeroed a 1 MB buffer per partial-aggregate — pure overhead
    * at the actual item counts. False positives are verified away by
    * the exact join downstream, so sizing affects PRUNE EFFICIENCY
    * only, never results; a genuinely larger eval set passes
    * `numBits` explicitly (scale ∝ items, 16 bits/item). */
  val DefaultItems: Long = 100000L
  val DefaultBits: Long = 1000000L

  private def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_bloom_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }

  /** Serialized bloom over `xxhash64(c)` of every row of `df` — ONE
    * distributed aggregate (partial blooms merge by OR), no
    * row-collect: only the final bitmap (≈ numBits/8 bytes) reaches
    * the driver. Returns None for an empty frame (no bloom = nothing
    * can match — callers should short-circuit to "no hits"). */
  def build(df: DataFrame, c: Column,
      expectedItems: Long = DefaultItems,
      numBits: Long = DefaultBits): Option[Array[Byte]] = {
    register(df.sparkSession)
    // The item count rides the SAME aggregate pass (ADVICE r19): a
    // build side that outgrows the default sizing would push the
    // false-positive rate toward 1 and silently nullify the map-side
    // prune (results stay correct — the exact join removes FPs — but
    // the operator's scale rationale evaporates). When that happens,
    // re-build once at 16 bits/item, capped at Spark's runtime-filter
    // ceiling (64M bits = 8 MB); the common case stays one pass.
    val row = df.agg(
      call_function("graft_bloom_agg", xxhash64(c),
        lit(expectedItems), lit(numBits)).as("bf"),
      count(lit(1)).as("n")).head()
    if (row.isNullAt(0)) None
    else {
      val n = row.getLong(1)
      if (n <= expectedItems) Some(row.getAs[Array[Byte]](0))
      else {
        val bits = math.min(math.max(numBits, 16L * n), 67108864L)
        log.warn(s"bloom build side has $n items > expectedItems=" +
          s"$expectedItems — re-building at $bits bits (16/item) to keep " +
          "the map-side prune selective; pass expectedItems/numBits to " +
          "skip the second pass")
        val row2 = df.agg(
          call_function("graft_bloom_agg", xxhash64(c),
            lit(n), lit(bits)).as("bf")).head()
        if (row2.isNullAt(0)) None else Some(row2.getAs[Array[Byte]](0))
      }
    }
  }

  /** Membership probe column: `might_contain(bloom, xxhash64(c))` —
    * a scalar, codegen'd predicate (the bloom bits ride along as a
    * broadcast-sized literal), so a corpus-side `.filter` on it is
    * MAP-ONLY: no shuffle, no join, prunes before any exchange. */
  def mightContain(spark: SparkSession, bloom: Array[Byte], c: Column): Column = {
    register(spark)
    call_function("graft_bloom_might_contain", lit(bloom), xxhash64(c))
  }
}
