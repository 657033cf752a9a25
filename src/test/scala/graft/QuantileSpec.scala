package graft

import org.apache.spark.sql.functions._

import graft.queries.Relational

/** The percentile pair: exact q14 (oracle-gated) vs the approx_percentile
  * drop-in a 100 TB run would use. The exact aggregate's state is a
  * value→count map — memory grows with group cardinality, which is the
  * aggregate that dies first on a skewed huge group; the sketch is
  * bounded by the accuracy parameter. The spec pins the guarantee the
  * swap rests on: the returned value's RANK is within n/accuracy of the
  * target rank (rank error is what approx_percentile promises — value
  * error depends on the data's density and is not bounded).
  */
class QuantileSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.1"
  private val accuracy = 1000

  test("approx percentile rank error is within n/accuracy per group") {
    val s = spark
    import s.implicits._
    val approx = Relational.percentileApprox(spark, dir, accuracy)
      .select("event_type", "p50", "p90", "n").as[(String, Double, Double, Long)]
      .collect()
    assert(approx.nonEmpty)
    val events = Tables.events(spark, dir)
      .select(col("event_type"), col("value")).persist()
    try {
      approx.foreach { case (et, p50, p90, n) =>
        // tie-safe: a value with duplicates occupies the rank interval
        // [count(<v)+1, count(<=v)]; the guarantee promises SOME rank in
        // that interval is within n/accuracy of the target, so assert
        // interval-overlap, not a point rank (count(<=v) alone overstates
        // the rank at the upper end of a tie run)
        def rankRange(v: Double): (Long, Long) = {
          val below = events
            .filter(col("event_type") === et && col("value") < v).count()
          val upto = events
            .filter(col("event_type") === et && col("value") <= v).count()
          (below + 1, upto)
        }
        val slack = n.toDouble / accuracy + 1 // +1: rank-boundary discreteness
        def check(v: Double, target: Double, label: String): Unit = {
          val (lo, hi) = rankRange(v)
          assert(lo <= target + slack && hi >= target - slack,
            s"$et $label: rank interval [$lo, $hi] misses target $target " +
              s"± $slack (n=$n)")
        }
        check(p50, 0.5 * n, "p50")
        check(p90, 0.9 * n, "p90")
        // the sketch returns an actual data value, not an interpolation —
        // the property that makes the rank-error guarantee meaningful
        assert(events.filter(col("event_type") === et &&
          col("value") === p50).count() > 0)
      }
    } finally events.unpersist()
  }

  test("exact and approx agree on the driver corpus within rank slack") {
    // not a bit-match (the exact form interpolates between neighbors;
    // the sketch returns a member) — but at sf0.1 group sizes the two
    // must bracket each other tightly; a gross divergence means the
    // drop-in is mis-specified
    val exact = SparkEntry.queries("q14_percentile")(spark, dir)
      .select("event_type", "p50", "p90").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val approx = Relational.percentileApprox(spark, dir, accuracy)
      .select("event_type", "p50", "p90").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (et, (e50, e90)) =>
      val (a50, a90) = approx(et)
      assert(math.abs(a50 - e50) / math.max(math.abs(e50), 1.0) < 0.02,
        s"$et p50: approx $a50 vs exact $e50")
      assert(math.abs(a90 - e90) / math.max(math.abs(e90), 1.0) < 0.02,
        s"$et p90: approx $a90 vs exact $e90")
    }
  }
}
