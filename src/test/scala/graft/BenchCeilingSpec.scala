package graft

/** Normalized performance ceilings for the heavy bench rows (VERDICT r9
  * ask #6 established the pattern for q60: "the number is governed by a
  * test, not a BASELINE paragraph"; VERDICT r12 ask #5 extends it to
  * every row the judge's plan audit reads — q58, mm9, q57, dd12, p20 —
  * so a regression in ANY of them fails `sbt test` instead of waiting
  * for a human to diff BENCH jsons).
  *
  * These rows' cost at gate SFs is fixed per-Exchange/per-job overhead
  * on small data — scale-sane (the stages amortize at 100 TB) but
  * drift-prone as sessions add stages. An absolute wall-clock assertion
  * would flap with box contention, so each ceiling is NORMALIZED: the
  * query's min-of-3 must stay within a fixed multiple of the same
  * session's min-of-3 calibration workload (Bench's `_calibration`
  * shape — constant 20M-row zero-IO hash aggregate, a pure box-speed
  * probe). Contention inflates both numbers together; a genuine plan
  * regression (a new Exchange chain, a lost persist, a cartesian)
  * inflates only the numerator and trips the gate.
  *
  * Ceilings: measured local[4] ratios on a quiet box are recorded per
  * row below; each ceiling is ~2-2.5× its measured ratio — loose enough
  * for scheduler jitter at toy scale, tight enough to fail the ~3×
  * blowups that triggered three rounds of BASELINE paragraphs. The
  * small absolute calibration floor keeps the ratios meaningful if the
  * calibration itself degenerates (a sub-50 ms cal would make any
  * ratio vacuous). Memo state is cleared before EVERY timed run so the
  * ceilings govern the raw pipelines (the driver bench's `raw` map),
  * not memo hits.
  */
class BenchCeilingSpec extends SparkSuite {

  private def noopRun(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def freshState(): Unit = {
    graft.queries.Dedup.clearMemo()
    graft.queries.Text.clearBpeMemo()
    spark.catalog.clearCache()
  }

  /** (query, ceiling) — measured quiet-box local[4] ratios r13:
    * q60 9.3, q58 8.8, mm9 6.5, q57 5.6, dd12 4.4, p20 5.2 (cal 0.41 s).
    * q60 keeps its historical 25 (ratio ranged 8-14 across sessions);
    * the rest get ~2.5× their r13 measurement.
    */
  private val Heavy = Seq(
    "q60_triangle_count" -> 25.0,
    "q58_pagerank" -> 22.0,
    "mm9_binary_ingest" -> 16.0,
    "q57_copurchase_pairs" -> 14.0,
    "dd12_containment" -> 11.0,
    "p20_stage_attrition" -> 13.0)

  test("the six heavy bench rows stay within their calibrated " +
    "fixed-overhead envelopes") {
    val dir = "/root/testdata/sf0.1"
    // Bench.calibrate IS the normalizer — one shared definition, so the
    // spec's ratios and the driver's _calibration row measure the same
    // workload. The calibration is re-measured ADJACENT to every timed
    // query run (not once up front): under sbt's parallel suite
    // execution the shared local[4] session's load drifts over the
    // minutes between an up-front calibration and the later query
    // timings, and a quiet-then-busy box inflated only the numerator
    // (observed: dd12 at 17.5× a stale 0.305 s cal in-suite, 3.0× its
    // adjacent cal in isolation). A per-run (query / adjacent-cal)
    // ratio keeps numerator and denominator under the SAME contention;
    // min over runs then discards the noisy rounds.
    val failures = Heavy.flatMap { case (name, ceiling) =>
      val q = SparkEntry.queries(name)
      // warm-up: JIT + codegen land outside the timings
      freshState()
      noopRun(q(spark, dir))
      val runs = (1 to 3).map { _ =>
        val cal = Bench.calibrate(spark, runs = 1).max(0.05)
        freshState()
        val t0 = System.nanoTime()
        noopRun(q(spark, dir))
        val t = (System.nanoTime() - t0) / 1e9
        (t, cal, t / cal)
      }
      val (t, cal, ratio) = runs.minBy(_._3)
      info(f"$name%-22s best run = $t%.3f s / cal $cal%.3f s, " +
        f"ratio = $ratio%.1f (ceiling $ceiling%.0f)")
      if (ratio <= ceiling) None
      else Some(f"$name $t%.3f s = $ratio%.1fx cal $cal%.3f s " +
        f"(ceiling $ceiling%.0f)")
    }
    assert(failures.isEmpty,
      "plan regressions, not box noise (calibration normalizes that):\n" +
        failures.mkString("\n"))
  }
}
