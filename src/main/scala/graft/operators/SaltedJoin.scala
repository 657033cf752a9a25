package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the MANUAL complement to AQE's
  * skew-join splitting. Decision rule, in order:
  *
  *  1. Small other side → `broadcast()` it. No shuffle, no skew problem
  *     at all; salting a broadcastable join is pure overhead.
  *  2. Shuffled join (fact-fact, or dim too big to broadcast) with a
  *     skewed key → do NOTHING first: AQE's skew-join splits the
  *     oversized shuffle partitions at runtime
  *     (`spark.sql.adaptive.skewJoin.enabled`, on by default) and
  *     handles even a single mega-hot key for the JOIN itself —
  *     SaltedJoinSpec demonstrates the split (`skew=true` in the final
  *     adaptive plan) on the unsalted q25 shape, and PLANS.md shows the
  *     two plans side by side.
  *  3. Reach for [[SaltedJoin]] only when AQE can't see or can't fix
  *     the skew: a skewed AGGREGATION downstream of the join (AQE
  *     rebalances the join stage, not a later groupBy on the same hot
  *     key — the salt, kept in the grouping key for a partial/final
  *     two-phase agg, fixes both); Structured Streaming joins (no AQE
  *     re-planning mid-stream); or when the join strategy AQE picks
  *     (e.g. broadcast after runtime stats) must be overridden
  *     deterministically for layout reasons.
  *
  * q25 keeps the salted form under the oracle gate because it is the
  * operator being certified; a plain batch query with the same shape
  * should try rules 1-2 first.
  *
  * Standard construction: the skewed (large, hot-keyed) side gets a
  * uniform random salt in [0, k); the other side is replicated k× with
  * every salt value (`explode`), and the join key becomes (key, salt).
  * Each hot key's rows now spread over k shuffle partitions instead of
  * one. Cost: k× replication of the smaller side — choose k ≈ (hot-key
  * row count / target partition rows).
  *
  * Salt is `pmod(hash(monotonically_increasing_id()), k)` — deterministic
  * per partition layout, uniform, and independent of the data (a
  * data-derived salt would re-skew if the salting column correlates with
  * the hot key).
  */
object SaltedJoin {

  /** Inner equi-join `left ⋈ right` on `key`, with `left` treated as the
    * skewed side and `right` replicated `saltBuckets`×.
    */
  def join(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 1)
    require(!left.columns.contains("_salt") && !right.columns.contains("_salt"),
      "inputs must not contain a _salt column")
    val salted = left.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
