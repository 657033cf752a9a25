package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-derived caps for the candidate-generation cuts (dd2's
  * doc-frequency cut, dd3/dd4's LSH bucket caps).
  *
  * A constant cap is tuned to one corpus: on a 100 TB corpus whose
  * hot-shingle / bucket-occupancy distribution has shifted, a too-low
  * cap silently cuts recall and a too-high one re-admits the quadratic
  * flood buckets. The cap here is derived from the count distribution
  * itself — `max(floor, p99.9 of the counts)` — so the cut tracks the
  * corpus: organic growth in typical bucket sizes raises the cap, while
  * the pathological top 0.1 ‰-tail (the flood buckets) stays cut. The
  * floor keeps small corpora (where p99.9 is 1-2) at the hand-validated
  * test-SF behavior, and makes the cap MONOTONE in corpus "heat": it can
  * only rise above the floor, and raising a cap only ADDS candidates
  * (AdaptiveCapSpec pins both properties).
  *
  * The percentile is EXACT (ceil-rank over the histogram of count
  * values), not `percentile_approx`: [[RangeJoin.adaptiveWidth]] may be
  * approximate because ANY positive width yields the same join result,
  * but a cap changes the candidate SET, so the DuckDB oracle must derive
  * the identical integer from the same counts — sketch-based quantiles
  * differ across engines by construction.
  *
  * Cost: one map-side-combined aggregation of the counts frame into a
  * histogram of count VALUES, collected to the driver — |distinct count
  * values| rows (bounded by the largest count; zipfian corpora give
  * thousands of rows, not millions — the same driver-lookup class as the
  * grid-axis collects).
  */
object AdaptiveCap {

  /** `max(floor, permille-rank of countCol)`, where the rank value is the
    * smallest count v whose cumulative frequency reaches
    * `ceil(permille × n / 1000)` — all-integer arithmetic, replayed
    * bit-for-bit by the oracle's windowed-cumsum SQL
    * ([[graft.queries.Dedup]] `permilleCapSql`).
    */
  def permilleCap(counts: DataFrame, countCol: String, floor: Long,
      permille: Int = 999): Long =
    permilleCapWithMax(counts, countCol, floor, permille)._1

  /** [[permilleCap]] plus the LARGEST count value, read off the same
    * collected histogram for free (its last row). Callers use the max to
    * prove a hot-tail cut vacuous — `max ≤ cap` means NO count exceeds
    * the cap, so the consumer can skip building its over-cap side
    * entirely (dd2/dd12 skip the `nhot` aggregation + two joins) instead
    * of running provably-empty plan branches. An empty counts frame
    * reports max = 0 (no count exceeds any cap ≥ floor ≥ 0).
    */
  def permilleCapWithMax(counts: DataFrame, countCol: String, floor: Long,
      permille: Int = 999): (Long, Long) = {
    require(permille >= 1 && permille <= 1000, s"bad permille $permille")
    val hist = counts
      .groupBy(col(countCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val n = hist.iterator.map(_._2).sum
    if (n == 0L) (floor, 0L)
    else {
      val rank = (permille.toLong * n + 999L) / 1000L // exact ceil
      val cums = hist.iterator.scanLeft(0L)(_ + _._2).drop(1).toArray
      val idx = cums.indexWhere(_ >= rank)
      (math.max(floor, hist(idx)._1), hist.last._1)
    }
  }
}
