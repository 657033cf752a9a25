package graft

import org.apache.spark.sql.functions._

import graft.queries.Relational

/** The profiling/validation family: exact q32 (events profile, the
  * oracle-gated plumbing) vs its approx_count_distinct 100 TB drop-in,
  * the CMS vocabulary sketch, the q55 constraint report, the windowed
  * HLL fallback — plus p17 (the generalized any-table column profile
  * with numeric min/max, `Profiling.columnProfile`) and p18 (the PSI
  * drift monitor): metric semantics on constructed frames, exact↔HLL
  * agreement, PSI's zero-at-identity / positive-under-shift behavior,
  * and the plan shapes the Scaladocs claim (one corpus scan per
  * profile, no sort-merge join in p18's 20-row arithmetic).
  */
class ProfilingSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.1"
  private val sfSmall = "/root/testdata/sf0.001"

  // ---- q32/q55/CMS/windowed-HLL — the pre-existing validation family

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

  test("windowed HLL distinct (q53's >64-symbol fallback) stays within " +
      "5% of the exact per-frame set") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // 150-symbol vocabulary — past the bitmask's 64-bit ceiling by
    // construction; 8 users × 300 events spread over ~6 hours so the
    // trailing-hour frames hold anywhere from a handful to ~50 events
    val rnd = new scala.util.Random(13)
    val rows = for {
      u <- 0 until 8; i <- 0 until 300
    } yield (u.toLong, (u * 1000 + i).toLong,
      rnd.nextInt(6 * 3600) * 1000000L, s"type_${rnd.nextInt(150)}")
    val ev = rows.toDF("user_id", "event_id", "us", "event_type")
      .repartition(8)
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    val exact = ev.select(col("event_id"),
      size(collect_set(col("event_type")).over(w)).cast("long").as("nd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = Relational.windowDistinctApprox(ev)
      .select(col("event_id"), col("n_types_1h_est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    // per-frame envelope (rsd 0.02 → 5% is > 2σ; HLL++ is bias-corrected
    // and near-exact at these cardinalities)
    est.foreach { case (id, e) =>
      val x = exact(id)
      assert(math.abs(e - x).toDouble / math.max(x, 1L) <= 0.05,
        s"event $id: est $e vs exact $x")
    }
    // the fixture actually exercises the >64 regime the bitmask cannot
    assert(exact.values.max > 30, "fixture frames too small to be probative")
  }

  // ---- p17/p18 — the generalized profile operator + the PSI monitor

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

  test("exact and HLL columnProfile forms agree within sketch tolerance") {
    val docs = Tables.documents(spark, sfSmall)
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
    val plan = SparkEntry.queries("p17_column_profile")(spark, sfSmall)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"expected 1 corpus scan, saw $scans:\n$plan")
  }

  test("PSI is ~0 on identical snapshots and positive under a shift") {
    import spark.implicits._
    // length derives from i/2 so the even/odd parity halves see the
    // SAME length distribution (i%10 would correlate with parity)
    val same = (0L until 400L).map(i => (i, ((i / 2) % 10) * 100L))
      .toDF("doc_id", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("psi").toString
    try {
      same.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val res = SparkEntry.queries("p18_drift_psi")(spark, tmp)
        .agg(max("psi_total")).collect()(0).getDouble(0)
      assert(math.abs(res) < 1e-12, s"identical halves gave PSI $res")

      val shifted = (0L until 400L).map { i =>
        // current (odd) snapshot runs 4× longer docs — clear drift
        val base = (i / 2) % 10
        val len = if (i % 2 == 0) base * 100L else base * 400L
        (i, len)
      }.toDF("doc_id", "n_chars")
      shifted.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val res2 = SparkEntry.queries("p18_drift_psi")(spark, tmp)
        .agg(max("psi_total")).collect()(0).getDouble(0)
      assert(res2 > 0.1, s"shifted snapshot gave PSI $res2 — alarm too weak")
    } finally {
      graft.util.Fs.rmTree(spark, tmp)
    }
  }

  test("constraintReport: declared order, kinds fold correctly, one scan") {
    import spark.implicits._
    import graft.queries.Profiling
    import graft.queries.Profiling.{AggCheck, RefCheck, RowCheck}
    val df = Seq((1L, "a"), (2L, "b"), (2L, "c"), (3L, null))
      .toDF("k", "v")
    val refViol = Seq(7L).toDF("violations").agg(sum("violations"))
    val rep = Profiling.constraintReport(df, Seq(
      RowCheck("v_complete", col("v").isNull),
      AggCheck("k_unique", count(lit(1)) - countDistinct(col("k"))),
      RefCheck("ref", refViol)))
    val rows = rep.collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("v_complete", "k_unique", "ref"), "declared order lost")
    val byName = rows.map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(byName("v_complete") == ((1L, 4L, false)))
    assert(byName("k_unique") == ((1L, 4L, false))) // 4 rows, 3 distinct k
    assert(byName("ref") == ((7L, 4L, false)))
  }

  test("p19 doc constraints: the lang allow-list fails non-vacuously, " +
      "the rest pass") {
    val rows = SparkEntry.queries("p19_doc_constraints")(spark, sfSmall)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(rows.size == 5)
    assert(!rows("domain_lang_allowed")._2 &&
      rows("domain_lang_allowed")._1 > 0,
      "zh must violate the deliberate allow-list — vacuous otherwise")
    (rows - "domain_lang_allowed").foreach { case (c, (v, pass)) =>
      assert(pass && v == 0L, s"$c unexpectedly failing: $v violations")
    }
  }

  test("p18's corpus aggregation plans without a sort-merge join") {
    val plan = SparkEntry.queries("p18_drift_psi")(spark, sfSmall)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"p18 should join its 20-row frames broadcast-side:\n$plan")
  }
}
