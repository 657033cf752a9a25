package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.functions.MisraGries

/** Streaming sketch maintenance — the ingest-time form of the two-pass
  * heavy-hitter pattern (batch: t25). An unbounded key stream (n-grams,
  * URLs, user agents) is sharded by key hash; each shard carries ONE
  * Misra–Gries summary in O(m) state across micro-batches, emitting its
  * current candidate set every trigger.
  *
  * Guarantee composition: a key hashes to exactly one shard, so its full
  * stream count is seen by that shard's summary, whose undercount is
  * ≤ n_shard/(m+1) ≤ N/(m+1) — the UNION of shard candidates therefore
  * contains every key with global count > N/(m+1), same bound as the
  * batch single-summary form, while state and per-batch work spread
  * across `shards` parallel state-store partitions. A periodic pass-2
  * (exact counts of the union, batch-side) completes the pattern;
  * StreamingSpec pins stream-ingested candidates + pass-2 == t25's
  * batch GROUP BY … HAVING output on the driver fixture.
  *
  * At 100 TB/day: state is shards × m counters — MBs total, independent
  * of stream volume; the shard shuffle is the only wide edge.
  */
object SketchStream {

  /** Latest per-shard summary: parallel key/count seqs (the MG buffer)
    * plus the shard's exact stream length.
    */
  final case class ShardSummary(shard: Int, keys: Seq[String],
      counts: Seq[Long], n: Long)

  /** Deterministic shard of a key — stable across JVMs (String.hashCode
    * is specified), non-negative.
    */
  def shardOf(key: String, shards: Int): Int =
    math.floorMod(key.hashCode, shards)

  /** Stateful sharded Misra–Gries over a key stream. Update-mode: every
    * micro-batch re-emits each touched shard's current summary; the
    * latest row per shard is the live sketch.
    */
  def mgShards(keys: Dataset[String], m: Int, shards: Int)
      : Dataset[ShardSummary] = {
    import keys.sparkSession.implicits._
    val mg = new MisraGries(m)
    keys.groupByKey(shardOf(_, shards))
      .mapGroupsWithState[ShardSummary, ShardSummary](
          GroupStateTimeout.NoTimeout) {
        (shard, batch, state) =>
          val prev = state.getOption
          val buf = prev
            .map(s => mutable.Map(s.keys.zip(s.counts).toSeq: _*))
            .getOrElse(mutable.Map.empty[String, Long])
          var n = prev.map(_.n).getOrElse(0L)
          val folded = batch.foldLeft(buf) { (b, k) => n += 1; mg.reduce(b, k) }
          val ks = folded.keys.toSeq.sorted
          val next = ShardSummary(shard, ks, ks.map(folded), n)
          state.update(next)
          next
      }
  }
}
