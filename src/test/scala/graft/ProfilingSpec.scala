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

  test("count-min sketch bounds the exact top-term counts; merge is exact") {
    import org.apache.spark.sql.functions._
    import graft.queries.Text
    val eps = 1e-4
    val exact = SparkEntry.queries("t5_vocab_topk")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalTokens = Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))))
      .count()
    val cms = Text.vocabSketch(spark, dir, eps)
    exact.foreach { case (t, n) =>
      val est = cms.estimateCount(t)
      assert(est >= n, s"$t: CMS under-counted ($est < $n) — impossible " +
        "for a correct CMS; the sketch is broken")
      assert(est <= n + (eps * totalTokens).toLong + 1,
        s"$t: $est exceeds exact $n + eps*N")
    }
    // CMS is linear: sketches of disjoint halves merged counter-wise must
    // equal the single-pass sketch exactly (same seed → same hash plane)
    val even = Text.vocabSketch(spark, dir, eps,
      docFilter = col("doc_id") % 2 === 0)
    val odd = Text.vocabSketch(spark, dir, eps,
      docFilter = col("doc_id") % 2 =!= 0)
    even.mergeInPlace(odd)
    exact.keys.foreach { t =>
      assert(even.estimateCount(t) == cms.estimateCount(t),
        s"$t: merged-halves estimate diverged from single-pass")
    }
  }

  test("q55 dq report: one wide agg scan, and the uniqueness check fails") {
    val df = SparkEntry.queries("q55_dq_report")(spark, dir)
    // scale pin: 6 constraints must NOT mean 6 scans — one wide agg pass
    // over lineitem plus the referential anti-join's probe (2 lineitem
    // scans total) and the orders build side
    val scans = "(?m)Scan parquet".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(scans <= 3, s"dq report fanned out to $scans scans")
    val rows = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(rows.size == 6)
    // the fixture's (l_orderkey, l_linenumber) collides by construction —
    // a dq suite that can only pass tests nothing
    assert(!rows("unique_order_line")._2 && rows("unique_order_line")._1 > 0)
    (rows - "unique_order_line").foreach { case (c, (v, pass)) =>
      assert(pass && v == 0L, s"$c unexpectedly failing: $v violations")
    }
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
