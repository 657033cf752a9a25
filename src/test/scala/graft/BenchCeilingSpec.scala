package graft

/** Normalized performance ceiling for q60_triangle_count (VERDICT r9 ask
  * #6: "q60's number is governed by a test, not a BASELINE paragraph").
  *
  * q60's cost at gate SFs is fixed per-Exchange overhead on a ~3.6k-edge
  * graph — scale-sane (the stages amortize at 100 TB) but drift-prone as
  * sessions add stages. An absolute wall-clock assertion would flap with
  * box contention, so the ceiling is NORMALIZED: q60's min-of-3 must stay
  * within a fixed multiple of the same session's min-of-3 calibration
  * workload (Bench's `_calibration` shape — constant 20M-row zero-IO hash
  * aggregate, a pure box-speed probe). Contention inflates both numbers
  * together; a genuine plan regression (a new Exchange chain, a lost
  * persist, a cartesian) inflates only the numerator and trips the gate.
  *
  * Constants: on a quiet box the ratio sits ~8-14 in this session shape
  * (local[4]); the ceiling of 25 allows scheduler jitter at toy scale
  * while still failing the ~3× blowups that triggered three rounds of
  * BASELINE paragraphs. The small absolute floor keeps the test
  * meaningful if the calibration itself degenerates (a sub-50 ms cal
  * would make any ratio vacuous).
  */
class BenchCeilingSpec extends SparkSuite {

  private def timeMinOf(n: Int)(body: => Unit): Double =
    (1 to n).map { _ =>
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }.min

  private def noopRun(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  test("q60 stays within its calibrated fixed-overhead envelope") {
    val dir = "/root/testdata/sf0.1"
    val q60 = SparkEntry.queries("q60_triangle_count")
    // warm-up: JIT + codegen for both shapes land outside the timings
    noopRun(q60(spark, dir))
    // Bench.calibrate IS the normalizer — one shared definition, so the
    // spec's ratio and the driver's _calibration row measure the same
    // workload (its first call here doubles as its own warm-up via min)
    val cal = Bench.calibrate(spark, runs = 4).max(0.05)
    val t = timeMinOf(3) {
      spark.catalog.clearCache()
      noopRun(q60(spark, dir))
    }
    info(f"q60 min-of-3 = $t%.3f s, calibration = $cal%.3f s, " +
      f"ratio = ${t / cal}%.1f (ceiling 25)")
    assert(t <= 25.0 * cal,
      f"q60 $t%.3f s exceeds 25x the box calibration $cal%.3f s — " +
        "a plan regression, not box noise (calibration normalizes that)")
  }
}
