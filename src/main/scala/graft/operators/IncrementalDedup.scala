package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * the batch side, corpus-key-sized on the other. With `bloomItems > 0`, a
  * Bloom filter over the corpus keys (built by Spark's distributed
  * `stat.bloomFilter` aggregate, ~1.2 MB/M keys at 1% fpp, broadcast once)
  * pre-screens the batch: rows the filter REJECTS are definite non-members
  * and bypass the anti-join entirely, so the exact join's shuffle carries
  * only true duplicates plus the fpp sliver of false positives — on a
  * mostly-novel crawl that is a ~100× shuffle-volume cut. False positives
  * are then cleared by the exact join, so the result is exact either way
  * (IncrementalDedupSpec pins bloom-on == bloom-off).
  *
  * The membership probe is a JVM closure over the broadcast filter (Spark
  * exposes no public Column form of BloomFilterMightContain); it sits on
  * the pre-filter path only — every exact operator stays Catalyst.
  */
object IncrementalDedup {

  /** @param batch      new rows; must carry `key` and `winner` columns
    *                   (`winner` unique per row, e.g. a doc id)
    * @param corpusKeys existing corpus keys (single column `key`; need not
    *                   be distinct — the anti-join only tests existence)
    * @param bloomItems expected corpus key count for Bloom sizing; 0
    *                   disables the pre-filter (exact path only)
    */
  def apply(batch: DataFrame, corpusKeys: DataFrame, key: String,
      winner: String, bloomItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    val winners = batch
      .join(batch.groupBy(key).agg(min(winner).as(winner)), Seq(key, winner))
    if (bloomItems <= 0L) winners.join(corpusKeys, Seq(key), "left_anti")
    else {
      val bf = corpusKeys.stat.bloomFilter(key, bloomItems, fpp)
      val bfB = batch.sparkSession.sparkContext.broadcast(bf)
      val mightContain = udf((k: String) => bfB.value.mightContainString(k))
      winners.filter(!mightContain(col(key)))
        .unionByName(winners.filter(mightContain(col(key)))
          .join(corpusKeys, Seq(key), "left_anti"))
    }
  }
}
