package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (the manual complement to AQE's
  * skew-join splitting, for cases AQE can't fix — e.g. a single hot key
  * that exceeds one executor's memory even after split, or a broadcast
  * that almost-fits).
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
