package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a nested-loop scan.
  *
  * The naive formulation — `points JOIN intervals ON p BETWEEN lo AND hi`
  * — has no equi-key, so Spark plans a BroadcastNestedLoopJoin:
  * |points| × |intervals| comparisons, a scale-killer when both sides are
  * large (the same trap dd7's all-pairs scan had). The standard fix is
  * binning: pick a bucket width `w`, give every point its single bucket
  * `floor(p / w)`, explode every interval to the buckets it covers
  * (`sequence(floor(lo/w), floor(hi/w))`), equi-join on the bucket id, and
  * keep the residual `BETWEEN` filter. Work becomes
  * |points| + Σ intervals × (len/w) join-key rows hashed — linear, shuffled
  * on a key Catalyst understands (AQE can re-plan/broadcast it), instead of
  * quadratic.
  *
  * No dedup is needed: a point lies in exactly one bucket, so each
  * (point, interval) pair can only meet once.
  *
  * `w` trades replication for bucket selectivity: the interval side
  * explodes to ~`len/w + 1` rows. Choose `w` near the median interval
  * length (the MEDIAN interval then replicates ≈ 2×); a pathological
  * mega-interval still contributes `len/w` rows — bounded by
  * [[RangeJoin.MaxBucketsPerInterval]] under [[RangeJoin.adaptiveWidth]] —
  * never a cross product.
  */
object RangeJoin {

  /** Hard cap on the bucket count any single interval may explode into
    * under [[adaptiveWidth]]. Median-based width alone bounds the MEDIAN
    * interval's replication (~2×) but not the expectation: each interval
    * fans out to ~`len/w` rows, so expected replication is
    * `avg(len)/median(len)` — unbounded for heavy-tailed inputs (many
    * tiny intervals plus a few huge ones), where one mega-interval's
    * `sequence()` can build an enormous per-row array (executor OOM, or
    * Spark's sequence length limit as a runtime error). Clamping the
    * width to `maxLen / MaxBucketsPerInterval` caps the worst interval's
    * fan-out at 4096 rows (~32 KB of bucket ids) while leaving the median
    * width in charge whenever the tail is tame. The price of a raised
    * width is a looser bucket (more residual-filter work per probe),
    * never a correctness change — the residual BETWEEN keeps semantics
    * exact at any positive width.
    */
  val MaxBucketsPerInterval = 4096

  /** Bucket width derived from the interval-length distribution:
    * `max(median(len), max(len) / MaxBucketsPerInterval)`. The median
    * term keeps the TYPICAL interval's replication near 2× (a hard-coded
    * width only achieves that for the one distribution it was tuned on);
    * the max term bounds the WORST interval's fan-out — see
    * [[MaxBucketsPerInterval]] for why median alone is not a bound.
    * Computed with one `percentile_approx`+`max` agg over the interval
    * side (a single-row driver lookup, same class as the grid-axis
    * collects; the interval side of a range join is the dimension side,
    * so the extra scan is cheap and the frame is typically already cached
    * by the caller). Degenerate inputs (no valid intervals, or all
    * zero-length) fall back to width 1.0 — any positive width is correct
    * there, since each interval then spans at most 2 buckets.
    */
  def adaptiveWidth(intervals: DataFrame, loCol: String,
      hiCol: String): Double = {
    val len = (col(hiCol) - col(loCol)).cast("double")
    val row = intervals
      .filter(col(loCol) <= col(hiCol))
      .agg(percentile_approx(len, lit(0.5), lit(1000)).as("med"),
        max(len).as("mx"))
      .head()
    val med = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    val mx = if (row.isNullAt(1)) 0.0 else row.getDouble(1)
    val base = if (med > 0.0) med else 1.0
    math.max(base, mx / MaxBucketsPerInterval)
  }

  /** Adaptive-width variant: bucket width is derived from the intervals'
    * length distribution (see [[adaptiveWidth]]) — median replication
    * ≈ 2×, worst interval capped at [[MaxBucketsPerInterval]] buckets —
    * without a caller-tuned constant.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String): DataFrame =
    pointInInterval(points, intervals, pointCol, loCol, hiCol,
      adaptiveWidth(intervals, loCol, hiCol))

  /** Inner join of `points` (column `pointCol`, one row per point) with
    * `intervals` (columns `loCol`, `hiCol`; closed interval `[lo, hi]`),
    * on `lo <= p <= hi`, via bucketed equi-join with bucket width
    * `bucketWidth`. Intervals with `hi < lo` match nothing, same as
    * BETWEEN — they are filtered before the explode (Spark's `sequence`
    * infers a DESCENDING step when hi < lo rather than yielding empty, so
    * an inverted interval would otherwise fan out junk bucket rows).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val bucketCol = "_range_bucket"
    require(!points.columns.contains(bucketCol) &&
        !intervals.columns.contains(bucketCol),
      s"inputs must not contain a $bucketCol column")
    def bucketOf(c: Column): Column =
      floor(c / lit(bucketWidth)).cast("long")
    val p = points.withColumn(bucketCol, bucketOf(col(pointCol)))
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn(bucketCol,
        explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    p.join(iv, Seq(bucketCol))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(bucketCol)
  }

  /** Adaptive-width interval-interval overlap join: width from the median
    * length over BOTH sides' intervals pooled (each side's replication is
    * its own len/w + 1, so the pooled median balances the two explode
    * costs).
    */
  def intervalOverlap(a: DataFrame, b: DataFrame,
      loA: String, hiA: String, loB: String, hiB: String): DataFrame = {
    val pooled = a.select(col(loA).as("lo"), col(hiA).as("hi"))
      .unionAll(b.select(col(loB).as("lo"), col(hiB).as("hi")))
    intervalOverlap(a, b, loA, hiA, loB, hiB,
      adaptiveWidth(pooled, "lo", "hi"))
  }

  /** Interval-interval overlap join (closed intervals, `loA <= hiB AND
    * loB <= hiA`) via the same binning, extended to two exploded sides.
    *
    * Both sides explode over the buckets they cover and equi-join on the
    * bucket id — but a wide pair can now meet in MANY buckets, and a
    * `distinct()` to dedup would shuffle the full candidate set again.
    * Instead each pair is emitted exactly once by keeping it only in its
    * FIRST common bucket, `floor(max(loA, loB) / w)`: for a truly
    * overlapping pair `max(lo) <= min(hi)`, so that bucket lies inside
    * both ranges and both sides emitted it — one deterministic meeting
    * point, zero dedup cost. Input frames must have disjoint column names
    * (the join keeps both sides' columns).
    */
  def intervalOverlap(a: DataFrame, b: DataFrame,
      loA: String, hiA: String, loB: String, hiB: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val bucketCol = "_range_bucket"
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty,
      s"input column names must be disjoint, both have: ${shared.mkString(",")}")
    require(!a.columns.contains(bucketCol) && !b.columns.contains(bucketCol),
      s"inputs must not contain a $bucketCol column")
    def bucketOf(c: Column): Column =
      floor(c / lit(bucketWidth)).cast("long")
    def exploded(df: DataFrame, lo: String, hi: String): DataFrame =
      df.filter(col(lo) <= col(hi))
        .withColumn(bucketCol,
          explode(sequence(bucketOf(col(lo)), bucketOf(col(hi)))))
    exploded(a, loA, hiA).join(exploded(b, loB, hiB), Seq(bucketCol))
      .filter(col(loA) <= col(hiB) && col(loB) <= col(hiA))
      .filter(col(bucketCol) === bucketOf(greatest(col(loA), col(loB))))
      .drop(bucketCol)
  }
}
