package graft.operators

import org.apache.spark.sql.DataFrame

/** Per-round state materialization for iterative operators
  * ([[ConnectedComponents]] and its callers).
  *
  * Iterative Spark algorithms MUST sever lineage each round — the plan
  * otherwise deepens exponentially (each round references the previous
  * round's joins) and both planning time and any recomputation blow up.
  * HOW the severed frame is stored is a durability/speed trade-off:
  *
  *  - [[Materializer.Local]] — `localCheckpoint(eager)`: blocks live in
  *    executor storage memory/disk. Fastest (no DFS round-trip), and
  *    correct on the single-JVM `local[32]` harness where an "executor
  *    loss" would kill the whole app anyway. On a REAL cluster, losing
  *    any executor mid-iteration loses blocks whose lineage was
  *    discarded — the job dies unrecoverably.
  *  - [[Materializer.Reliable]] — `checkpoint(eager)` against a
  *    `SparkContext.setCheckpointDir` location (HDFS/object store on a
  *    cluster): each round's labels are written to the reliable store,
  *    so executor loss costs one task retry, not the job. This is the
  *    mode a 1000-executor run wants; the per-round write is small
  *    (the label frame is bounded by nodes-with-edges, never
  *    corpus-sized).
  *
  * The knob reaches production code via [[Materializer.fromEnv]]
  * (`GRAFT_ITER_CHECKPOINT_DIR`) and
  * [[graft.ingest.AppConfig.Resolved.iterMaterializer]].
  */
sealed trait Materializer {
  /** Materialize `df` eagerly and return a lineage-severed frame. */
  def apply(df: DataFrame): DataFrame
}

object Materializer {

  /** Executor-resident `localCheckpoint(eager = true)` — the local-mode
    * and interactive default. */
  case object Local extends Materializer {
    def apply(df: DataFrame): DataFrame = df.localCheckpoint(true)
  }

  /** Reliable `checkpoint(eager = true)` writing under `dir` (any
    * Hadoop-FS URI — `hdfs://…`, `s3a://…`, or a local path in tests).
    *
    * Sets the context checkpoint dir on first use; a checkpoint dir
    * already configured on the context (by the application or an
    * earlier Reliable materializer) takes precedence and is left
    * untouched — Spark appends a per-context UUID subdirectory to
    * whatever is set, so same-dir re-sets are not idempotent and
    * cross-materializer resets would scatter state.
    *
    * Checkpoint files accumulate for the application lifetime unless
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (GC-
    * driven) is set; a long-lived cluster session should either
    * enable that cleaner or point the dir at storage with a lifecycle
    * rule. Per-run size is bounded (rounds × label-frame size), so
    * this is retention hygiene, not a correctness concern. */
  final case class Reliable(dir: String) extends Materializer {
    def apply(df: DataFrame): DataFrame = {
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
      df.checkpoint(true)
    }
  }

  /** Deployment knob: `GRAFT_ITER_CHECKPOINT_DIR=<fs-uri>` selects
    * [[Reliable]] against that URI; unset/empty selects [[Local]].
    * Read at query-build time by the iterative query entries
    * (DedupQueries / VectorQueries), so a cluster submit flips every
    * iterative operator to durable state with one env var and zero
    * code changes. */
  def fromEnv(env: Map[String, String] = sys.env): Materializer =
    env.get("GRAFT_ITER_CHECKPOINT_DIR").filter(_.trim.nonEmpty)
      .map(Reliable(_)).getOrElse(Local)
}
