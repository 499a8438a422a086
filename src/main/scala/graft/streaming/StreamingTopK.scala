package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters (frequent tokens over an unbounded
  * stream): the SpaceSaving summary (Metwally et al., "Efficient
  * Computation of Frequent and Top-k Elements in Data Streams")
  * maintained per HASH SHARD via `mapGroupsWithState` — the streaming
  * twin of the batch `q_vocab_topk` family.
  *
  * Why sharded: a single global summary would funnel every token
  * occurrence through ONE state key = one task — the canonical
  * unbounded-stream scale-killer. Tokens are instead routed to
  * `nShards` state keys by token hash; each shard owns a DISJOINT
  * token subset (deterministic routing), so shard summaries compose
  * by concatenation + global top-k — no cross-shard double counting,
  * and state is bounded at `nShards × capacity` entries total
  * regardless of stream length or vocabulary size.
  *
  * SpaceSaving guarantees, per shard (standard, and asserted in
  * `StreamingTopKSpec`):
  *  - `est ≥ true count` (never undercounts);
  *  - `est − err ≤ true count` (`err` brackets the overcount);
  *  - any token with true count > min(est) is IN the summary;
  *  - with capacity ≥ distinct tokens routed to the shard, `err = 0`
  *    and every `est` is EXACT — the regime the cross-check spec
  *    pins against the batch groupBy counts.
  *
  * Emission: Update mode — each micro-batch re-emits the summary rows
  * of the shards it touched (`TokenCount(shard, token, est, err)`);
  * the consumer keeps the latest row per (shard, token) and takes a
  * global top-k (the spec does exactly that against a memory sink).
  */
object StreamingTopK {

  final case class TokenCount(shard: Int, token: String, est: Long, err: Long)

  /** Mutable-free shard summary: token → (est, err), capped at
    * `capacity` entries by SpaceSaving replacement (evict the minimum
    * est; the newcomer inherits est_min as its error bound). */
  final case class ShardSummary(entries: Map[String, (Long, Long)])

  def topkSummaries(spark: SparkSession, tokens: Dataset[String],
      nShards: Int, capacity: Int): Dataset[TokenCount] = {
    import spark.implicits._
    require(nShards >= 1 && capacity >= 1)
    tokens
      .groupByKey(t => math.floorMod(t.hashCode, nShards))
      .mapGroupsWithState[ShardSummary, List[TokenCount]](
        GroupStateTimeout.NoTimeout) {
        (shard: Int, toks: Iterator[String], state: GroupState[ShardSummary]) =>
          var m = state.getOption.map(_.entries).getOrElse(Map.empty)
          toks.foreach { t =>
            m.get(t) match {
              case Some((est, err)) => m = m.updated(t, (est + 1L, err))
              case None if m.size < capacity => m = m.updated(t, (1L, 0L))
              case None =>
                // SpaceSaving eviction: replace the min-est entry
                // (ties → lexicographically smallest token, so the
                // summary is deterministic for a given arrival order);
                // the newcomer's est starts at min+1 with err = min.
                val (vt, (vest, _)) = m.minBy { case (k, (e, _)) => (e, k) }
                m = (m - vt).updated(t, (vest + 1L, vest))
            }
          }
          state.update(ShardSummary(m))
          m.toList.sortBy { case (k, (e, _)) => (-e, k) }
            .map { case (k, (e, r)) => TokenCount(shard, k, e, r) }
      }
      .flatMap(identity)
  }

  /** Reduce accumulated Update-mode summary rows to a global top-k
    * (ties → token asc). Per (shard, token) the LATEST row is the
    * max-`est` row — SpaceSaving's per-token estimate is
    * nondecreasing across emissions (an increment grows it; an
    * evicted token re-enters at min+1, and the shard minimum never
    * decreases) — so the reduce is order-independent. A token evicted
    * after its last emission leaves a stale row, but its est is ≤ the
    * shard minimum at eviction, so it is dominated by every live
    * entry and can displace only exact ties. Shards own disjoint
    * token sets: no merge arithmetic, no double counting. Production
    * consumers would instead upsert latest-per-key via foreachBatch +
    * [[graft.sink.UpsertSink]]; this reducer is the bounded-size
    * harness/read path. */
  def globalTopK(summaries: Dataset[TokenCount], k: Int): Seq[TokenCount] =
    summaries.collect().toSeq
      .groupBy(t => (t.shard, t.token))
      .map(_._2.maxBy(_.est))
      .toSeq.sortBy(t => (-t.est, t.token)).take(k)
}
