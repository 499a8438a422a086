package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness test tables (`TESTDATA.md`): TPC-H-ish star
  * schema + `events` stream table + LLM-pipeline tables (`documents`,
  * `embeddings`), one parquet per table under the scale-factor dir.
  *
  * All reads are plain `spark.read.parquet` so Catalyst's vectorized
  * reader, predicate pushdown and column pruning apply; at cluster
  * scale the same call works on a partitioned directory layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Floor a frame's partition count at the session default
    * parallelism (r19, guide §2.5 "input skew: … repartition
    * immediately after the read"): a single-row-group parquet file —
    * every bench-SF table here — scans as ONE task, so every
    * map-side kernel downstream (shingling, signature hashing,
    * verification) serializes on one core. The round-robin
    * repartition is deterministic (sort-before-repartition is on by
    * default, SPARK-23207) and a NO-OP whenever the scan already has
    * enough splits — any real-scale input — so this is a parallelism
    * floor, not a local tuning constant. Apply only where the
    * downstream per-row work is heavy enough to dwarf one small
    * exchange of the input rows. */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** [[spread]], but HASH-keyed on `c` instead of round-robin (r20):
    * where the downstream pipeline groups/windows/distincts on a key,
    * spreading BY that key makes the parallelism floor double as the
    * pipeline's one clustering exchange — e.g. `q_dedup_ppjoin`'s
    * `(doc_id, sh)` distinct and its two doc_id windows all reuse the
    * doc_id clustering (measured 3.68 s → 1.72 s at sf0.1 vs the
    * round-robin form; q_dup_spans 1.13 → 0.68, q_span_clean 1.55 →
    * 1.05). The key must be high-cardinality (doc_id is unique per
    * row) so the hash spreads evenly — guide §2.5. Same no-op
    * behavior as [[spread]] at real input sizes. */
  def spreadBy(df: DataFrame, c: org.apache.spark.sql.Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, c) else df
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
