package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{SimHash, TextFunctions}

/** STREAMING near-duplicate detection — the continuous form of the
  * batch [[graft.operators.SimHashDedup]] rule (SURVEY.md §2.11): as
  * documents arrive, each is flagged against the recently-seen corpus
  * with the SAME signature, banding, and Hamming-verification
  * semantics the oracle-checked `q_dedup_simhash` uses. The semantic
  * anchor is the reference's late-data handling
  * (`/root/reference/src/s3_processor.py:179-180`): bounded lookback,
  * then records age out.
  *
  * Shape: one codegen'd [[SimHash]] projection per document, a ×4
  * band explode, then `flatMapGroupsWithState` keyed by
  * `(band, bits)` — the stream-side analogue of the batch band
  * groupBy. State per band bucket is the retained
  * `(doc_id, sig, ts)` index inside the event-time horizon; an
  * incoming document is verified (exact `bitCount(xor)` ≤
  * `maxHamming`) against the bucket's retained signatures and emits
  * one [[StreamingSimHashDedup.Verdict]] per (matching retained doc,
  * colliding band) — the distinct `(dup_of, doc_id)` set is exactly
  * the batch pair set over the same horizon, which is what the
  * stream-vs-batch cross-check asserts (consumers `distinct` on
  * `(doc_id, dup_of)`; a pair can collide in up to 4 bands).
  *
  * 100 TB bounds, in order of defense:
  *  - the HORIZON is semantic: a match requires the retained doc
  *    within `horizonMs` of the new doc's EVENT time (same contract
  *    as the batch `q_watermark_dedup` twin) — not wall clock, so
  *    replays are deterministic;
  *  - state is GC'd by watermark: entries older than
  *    `watermark − horizon − delay` can never satisfy the match
  *    predicate for any admissible future event (events later than
  *    `watermark − delay` are gone per the watermark contract), so
  *    eviction never changes results, only bounds memory;
  *  - event-time timeout removes idle buckets entirely;
  *  - `maxPerBand` caps a pathological bucket (mass duplicates —
  *    same failure mode the batch `maxBucket` cap handles): beyond
  *    the cap new signatures are still VERIFIED against the retained
  *    index (so they still get verdicts) but are not added to it.
  *    Retained-oldest wins: the earliest docs are the canonical
  *    representatives a dedup keeps. Saturation is OBSERVABLE, not
  *    silent: pass a `capOverflow` accumulator and every
  *    verified-but-not-retained row counts — a growing value means
  *    pairs among beyond-cap docs are being missed and exact dedup
  *    upstream needs attention.
  *
  * Within one micro-batch a bucket's rows are buffered and sorted in
  * the state function (deterministic event-time order), so transient
  * memory per (band, bits) task is bounded by that bucket's mass in
  * the CURRENT batch, not by history. A stream of mass exact
  * duplicates concentrates batch rows in few buckets — run exact
  * dedup upstream first (the same sequencing the batch pipeline
  * documents) and the near-dup tail stays small.
  */
object StreamingSimHashDedup {

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)

  /** One flagged collision between the arriving doc and a retained
    * doc within `maxHamming` that shares this band. NORMALIZED to the
    * batch pair convention (ADVICE r8): `dup_of` is the smaller
    * doc_id of the pair — the canonical representative a
    * keep-min-id dedup retains — and `doc_id` the larger, regardless
    * of which of the two arrived later. In-order streams (ids
    * correlated with event time) see the intuitive reading (`doc_id`
    * = the arrival); out-of-order streams keep the documented
    * `distinct (dup_of, doc_id) == batch (doc_a, doc_b)` contract
    * instead of emitting reversed pairs. */
  final case class Verdict(doc_id: Long, band: Int, dup_of: Long, hamming: Int)

  final case class BandRow(band: Int, bits: Long, doc_id: Long, sig: Long,
      ts: Timestamp)

  /** Retained per-bucket index: (doc_id, sig, event-time millis). */
  final case class BandIndex(entries: List[(Long, Long, Long)])

  /** @param horizonMs        lookback: two docs pair only when their
    *                         EVENT times are within this many ms of
    *                         each other (symmetric — an out-of-order
    *                         arrival must not match a retained doc
    *                         arbitrarily far in its future)
    * @param watermarkDelayMs max lateness admitted by the stream
    * @param maxPerBand       retained-signature cap per band bucket
    * @param capOverflow      optional accumulator counting band-rows
    *                         VERIFIED but not retained because their
    *                         bucket is at `maxPerBand` (VERDICT r8 #3:
    *                         beyond the cap, two new docs that are
    *                         near-dups of each other only are never
    *                         flagged — this makes that blind spot
    *                         visible instead of silent; alert when it
    *                         grows in production) */
  def verdicts(spark: SparkSession, docs: Dataset[Doc],
      maxHamming: Int = 3, horizonMs: Long = 60 * 60000L,
      watermarkDelayMs: Long = 10 * 60000L,
      maxPerBand: Int = 200,
      capOverflow: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[Verdict] = {
    import spark.implicits._
    SimHash.register(spark)
    val banded = docs.toDF()
      .withColumn("sig",
        call_function("simhash", TextFunctions.wsTokens(col("text"))))
      .select(col("doc_id"), col("sig"), col("ts"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("sig"), b * 16)
              .bitwiseAND(lit(0xffffL)).as("bits"))
        }: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bits").as("bits"),
        col("doc_id"), col("sig"), col("ts"))
      .withWatermark("ts", s"$watermarkDelayMs milliseconds")
      .as[BandRow]

    banded.groupByKey(r => (r.band, r.bits))
      .flatMapGroupsWithState[BandIndex, Verdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, Long), rows: Iterator[BandRow], state: GroupState[BandIndex]) =>
          val wm = state.getCurrentWatermarkMs()
          // GC bound (see scaladoc): provably non-matching entries only.
          def live(es: List[(Long, Long, Long)]) =
            es.filter(_._3 >= wm - horizonMs - watermarkDelayMs)
          def park(es: List[(Long, Long, Long)]): Unit =
            if (es.isEmpty) state.remove()
            else {
              state.update(BandIndex(es))
              state.setTimeoutTimestamp(
                es.map(_._3).max + horizonMs + watermarkDelayMs + 1)
            }
          if (state.hasTimedOut) {
            park(live(state.getOption.map(_.entries).getOrElse(Nil)))
            Iterator.empty
          } else {
            var entries = live(state.getOption.map(_.entries).getOrElse(Nil))
            val out = List.newBuilder[Verdict]
            // deterministic within-batch order: event time, then id —
            // same-batch near-dups resolve exactly like cross-batch ones
            rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)).foreach { r =>
              val t = r.ts.getTime
              // symmetric horizon: |event-time gap| ≤ horizon, the same
              // unordered-pair predicate the batch rule applies — a
              // lower bound alone would let a late arrival match
              // retained docs arbitrarily far in its FUTURE
              val matches = entries.filter { case (_, sig, ets) =>
                java.lang.Long.bitCount(sig ^ r.sig) <= maxHamming &&
                  math.abs(ets - t) <= horizonMs
              }
              matches.foreach { case (mid, msig, _) =>
                out += Verdict(math.max(r.doc_id, mid), key._1,
                  math.min(r.doc_id, mid),
                  java.lang.Long.bitCount(msig ^ r.sig))
              }
              if (entries.size < maxPerBand)
                entries = (r.doc_id, r.sig, t) :: entries
              else capOverflow.foreach(_.add(1L))
            }
            park(entries)
            out.result().iterator
          }
      }
  }
}
