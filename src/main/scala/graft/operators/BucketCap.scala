package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucket-size cap for LSH candidate generation (dd3/dd4/s3/dd7).
  *
  * A banding join is sub-quadratic only while bucket occupancy is bounded;
  * an adversarial bucket — thousands of identical boilerplate docs, or
  * all-zero embeddings hashing to one SRP key — reintroduces a quadratic
  * pair explosion *inside* that bucket (m members → m²/2 candidate pairs).
  * The standard mitigation is to drop oversized buckets outright: members
  * of a bucket that large are near-universal within it, so the pairs it
  * would contribute are either exact duplicates (already caught by the
  * hash-groupBy exact pass, dd1) or boilerplate collisions that exact
  * re-ranking would discard. The cap bounds per-bucket work at cap²/2.
  *
  * Cost: one window count over the bucket key — a single shuffle that the
  * following self-join reuses (same key → co-partitioned, AQE merges the
  * exchanges).
  *
  * The same cap must be replayed by the DuckDB oracle (a size-filtered
  * bucket join over the dumped signature frames) so capped results stay
  * hash-checkable.
  */
object BucketCap {

  /** Keep only rows whose bucket (all `keyCols` equal) has ≤ `cap`
    * members.
    */
  def capBuckets(df: DataFrame, keyCols: Seq[String], cap: Int): DataFrame = {
    require(cap >= 2, s"cap $cap would drop every pair-producing bucket")
    val w = Window.partitionBy(keyCols.map(col): _*)
    df.withColumn("_bsz", count(lit(1)).over(w))
      .filter(col("_bsz") <= cap)
      .drop("_bsz")
  }
}
