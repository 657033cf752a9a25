package graft

import graft.queries.Relational

/** The data-profiling pair: exact q32 (the oracle-gated plumbing) vs the
  * approx_count_distinct drop-in a 100 TB run would use. The spec pins
  * the two claims the swap rests on: the approx plan loses the Expand
  * (the exact multi-distinct's ×|columns| row blow-up), and the HLL
  * estimates stay within the advertised error envelope of the exact
  * counts on real data.
  */
class ProfilingSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.1"

  test("approx profile plans one scan with no Expand; exact q32 needs it") {
    val approxPlan = Relational.profileApprox(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"),
      "HLL profile should aggregate all columns in one pass")
    val exactPlan = SparkEntry.queries("q32_profile")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact multi-distinct is expected to plan via Expand — if Spark " +
        "stopped needing it, q32's docs and this trade-off are stale")
  }

  test("approx distinct counts are within 5% of exact per column at sf0.1") {
    def byCol(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
      df.collect()
        .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val exact = byCol(SparkEntry.queries("q32_profile")(spark, dir))
    val approx = byCol(Relational.profileApprox(spark, dir))
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (c, (nnExact, ndExact)) =>
      val (nnApprox, ndApprox) = approx(c)
      assert(nnApprox == nnExact, s"$c: non-null counts are exact aggregates")
      val rel = math.abs(ndApprox - ndExact).toDouble / math.max(ndExact, 1L)
      assert(rel <= 0.05,
        s"$c: approx $ndApprox vs exact $ndExact (rel err $rel > 5%)")
    }
  }
}
