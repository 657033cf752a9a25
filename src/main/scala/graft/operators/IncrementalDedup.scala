package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Incremental (ingest-time) exact dedup: given a NEW batch of rows and an
  * EXISTING corpus key set, keep only batch rows that are novel — dedup the
  * batch internally (min `winner` per key survives) and drop every key the
  * corpus already holds. This is the steady-state form of dd1: a pipeline
  * deduplicates a 100 TB corpus once, then screens each day's crawl
  * against it instead of re-running the global groupBy.
  *
  * Scale design: the in-batch winner cut is a hash agg + re-join keyed on
  * the SAME column (one batch-sized shuffle, reused exchange); corpus
  * membership is a left_anti equi-join on the key — batch-sized shuffle on
  * the batch side (in production the corpus key table is bucketed on the
  * key, so only the batch moves). With `bloomItems > 0`, a Bloom filter
  * over the corpus keys (built by Spark's distributed `stat.bloomFilter`
  * aggregate, ~1.2 MB/M keys at 1% fpp, broadcast once) pre-screens the
  * batch: rows the filter REJECTS are definite non-members and bypass the
  * anti-join entirely, so the exact join's shuffle carries only true
  * duplicates plus the fpp sliver of false positives — on a mostly-novel
  * crawl that is a ~100× shuffle-volume cut. False positives are then
  * cleared by the exact join, so the result is exact either way
  * (IncrementalDedupSpec pins bloom-on == bloom-off).
  *
  * The membership probe is a JVM closure over the broadcast filter (Spark
  * exposes no public Column form of BloomFilterMightContain); it sits on
  * the pre-filter path only — every exact operator stays Catalyst. A null
  * key maps to "definitely novel" (bypass), matching the exact path where
  * a null never equi-joins; keys must be StringType (enforced — the
  * Bloom probe is type-specific, and a silent mismatch would crash only
  * the bloom-on path).
  */
object IncrementalDedup {

  /** Lazy screen; with the Bloom pre-filter the two union arms share the
    * winner-cut subtree UNCACHED, i.e. the batch scan + agg plan twice
    * (correct, but a bounded extra batch-side cost). Library callers on
    * large batches should prefer [[withCaches]] and release the returned
    * cache once their result is materialized.
    */
  def apply(batch: DataFrame, corpusKeys: DataFrame, key: String,
      winner: String, bloomItems: Long = 0L, fpp: Double = 0.01): DataFrame =
    build(batch, corpusKeys, key, winner, bloomItems, fpp,
      persistWinners = false)._1

  /** The production form: the winner cut is persisted so the bloom path's
    * two arms (definite-novel bypass + maybe-duplicate anti-join) share
    * one computation of the batch subtree. Returns (result, caches); the
    * caller releases the caches once the result is materialized —
    * `QueryCache.resultThenRelease(result, caches: _*)` is the repo's
    * pattern (p9 does exactly this; CacheHygieneSpec pins the release).
    */
  def withCaches(batch: DataFrame, corpusKeys: DataFrame, key: String,
      winner: String, bloomItems: Long = 0L,
      fpp: Double = 0.01): (DataFrame, Seq[DataFrame]) =
    build(batch, corpusKeys, key, winner, bloomItems, fpp,
      persistWinners = true)

  private def build(batch: DataFrame, corpusKeys: DataFrame, key: String,
      winner: String, bloomItems: Long, fpp: Double,
      persistWinners: Boolean): (DataFrame, Seq[DataFrame]) = {
    require(batch.schema(key).dataType == StringType,
      s"$key must be StringType: the Bloom probe is type-specific and a " +
        "non-string key would crash only the bloom-on path")
    val winners0 = batch
      .join(batch.groupBy(key).agg(min(winner).as(winner)), Seq(key, winner))
    // empty corpus: stat.bloomFilter aggregates zero partials into a null
    // buffer and the probe NPEs — the exact path handles the degenerate
    // case for free (anti-join against nothing keeps every winner)
    if (bloomItems <= 0L || corpusKeys.isEmpty)
      (winners0.join(corpusKeys, Seq(key), "left_anti"), Nil)
    else {
      val winners = if (persistWinners) winners0.persist() else winners0
      val bf = corpusKeys.stat.bloomFilter(key, bloomItems, fpp)
      val bfB = batch.sparkSession.sparkContext.broadcast(bf)
      // null → false: a null key cannot be a corpus member under equi-join
      // semantics, so it belongs on the definite-novel bypass
      val mightContain =
        udf((k: String) => k != null && bfB.value.mightContainString(k))
      val kept = winners.filter(!mightContain(col(key)))
        .unionByName(winners.filter(mightContain(col(key)))
          .join(corpusKeys, Seq(key), "left_anti"))
      (kept, if (persistWinners) Seq(winners) else Nil)
    }
  }
}
