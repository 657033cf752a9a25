package graft

import org.apache.spark.sql.functions._

/** p17/p18 — the Deequ-style profile and the PSI drift monitor.
  * Correctness of the metrics on constructed frames (nulls, empty
  * strata), the exact↔HLL agreement the 100 TB profile form relies on,
  * PSI's zero-at-identity / positive-under-shift behavior, and the
  * plan-shape facts the Scaladoc claims (p17 = ONE corpus scan even with
  * five exact DISTINCTs; p18's corpus side = one hash aggregation, no
  * sort-merge join anywhere).
  */
class ProfilingSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("columnProfile: completeness, distinctness, min/max, null typing") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("a"), None),
      (3L, None, Some(30L)),
      (4L, Some("b"), Some(10L))
    ).toDF("id", "s", "n")
    val prof = graft.queries.Profiling.columnProfile(df,
      Seq("id" -> true, "s" -> false, "n" -> true), exact = true)
      .collect().map(r => r.getString(0) -> r).toMap

    val id = prof("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 4 && id.getLong(3) == 4)
    assert(id.getLong(4) == 1 && id.getLong(5) == 4) // min/max
    val s = prof("s")
    assert(s.getLong(2) == 3, "s non-null count")
    assert(s.getLong(3) == 2, "s distinct excludes null")
    assert(s.isNullAt(4) && s.isNullAt(5), "non-numeric min/max are NULL")
    val n = prof("n")
    assert(n.getLong(2) == 3 && n.getLong(3) == 2)
    assert(n.getLong(4) == 10 && n.getLong(5) == 30)
  }

  test("exact and HLL profile forms agree within sketch tolerance") {
    val docs = Tables.documents(spark, sf)
    val cols = Seq("doc_id" -> true, "lang" -> false, "n_chars" -> true)
    def nd(exact: Boolean) =
      graft.queries.Profiling.columnProfile(docs, cols, exact)
        .select("col_name", "n_distinct").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val e = nd(true); val a = nd(false)
    for ((c, ev) <- e) {
      val av = a(c).toDouble
      assert(math.abs(av - ev) <= math.max(2.0, 0.05 * ev),
        s"HLL distinct for $c drifted: exact=$ev approx=$av")
    }
  }

  test("p17 profiles the corpus in ONE scan despite five exact DISTINCTs") {
    val plan = SparkEntry.queries("p17_column_profile")(spark, sf)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"expected 1 corpus scan, saw $scans:\n$plan")
  }

  test("PSI is ~0 on identical snapshots and positive under a shift") {
    import spark.implicits._
    // identical length distribution in both parity halves → only the
    // smoothing's rounding separates p and q
    // length derives from i/2 so the even/odd parity halves see the
    // SAME length distribution (i%10 would correlate with parity)
    val same = (0L until 400L).map(i => (i, ((i / 2) % 10) * 100L))
      .toDF("doc_id", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("psi").toString
    try {
      same.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // reuse only the binning/psi arithmetic via the query body on a
      // synthetic dir that mimics the documents layout
      val res = SparkEntry.queries("p18_drift_psi")(spark, dir)
        .agg(max("psi_total")).collect()(0).getDouble(0)
      assert(math.abs(res) < 1e-12, s"identical halves gave PSI $res")

      val shifted = (0L until 400L).map { i =>
        // current (odd) snapshot runs 4× longer docs — clear drift
        val base = (i / 2) % 10
        val len = if (i % 2 == 0) base * 100L else base * 400L
        (i, len)
      }.toDF("doc_id", "n_chars")
      shifted.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val res2 = SparkEntry.queries("p18_drift_psi")(spark, dir)
        .agg(max("psi_total")).collect()(0).getDouble(0)
      assert(res2 > 0.1, s"shifted snapshot gave PSI $res2 — alarm too weak")
    } finally {
      graft.util.Fs.rmTree(spark, dir)
    }
  }

  test("p18's corpus aggregation plans without a sort-merge join") {
    val plan = SparkEntry.queries("p18_drift_psi")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"p18 should join its 20-row frames broadcast-side:\n$plan")
  }
}
