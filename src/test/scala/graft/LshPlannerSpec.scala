package graft

import org.apache.spark.sql.functions._

/** Semantics of dd20's banding S-curve planner: the generated product
  * expression states 1 − (1 − j^r)^b exactly, the curve has the MMDS
  * §3.4 shape (monotone in j, steeper with larger r), and the scoring
  * picks a pareto-sensible config for the τ = 0.5 target.
  */
class LshPlannerSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("generated curve expression == closed-form math.pow reference") {
    import spark.implicits._
    val grid = for ((b, r) <- graft.queries.Dedup.LshConfigs; k <- 1 to 15)
      yield (b.toLong, r.toLong, k.toLong)
    val got = grid.toDF("bands", "rows_per_band", "k")
      .withColumn("j", expr("CAST(k AS DOUBLE) / 16.0"))
      .withColumn("pc", expr(graft.queries.Dedup.lshCurveCase))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(4)).toMap
    for ((b, r) <- graft.queries.Dedup.LshConfigs; k <- 1 to 15) {
      val j = k / 16.0
      val want = 1.0 - math.pow(1.0 - math.pow(j, r.toDouble), b.toDouble)
      val diff = math.abs(got((b.toLong, k.toLong)) - want)
      // repeated multiplication vs pow: ulp-level agreement is enough
      // here (the GATE's cross-engine exactness is by identical op
      // sequence, not by pow)
      assert(diff < 1e-12, s"(b=$b, r=$r, k=$k): got ${got((b.toLong, k.toLong))} want $want")
    }
  }

  test("dd20: S-curve laws and a non-degenerate best pick") {
    val rows = SparkEntry.queries("dd20_lsh_planner")(spark, sf).collect()
    assert(rows.length == graft.queries.Dedup.LshConfigs.length)
    // exactly one best config, and it is strictly better than the worst
    val errs = rows.map(r => r.getLong(r.fieldIndex("err_micros")))
    assert(rows.count(_.getBoolean(rows.head.fieldIndex("best"))) == 1)
    assert(errs.min < errs.max)
    // every mass is within its theoretical bound: 7 FP cells and 8 FN
    // cells of at most 1e6 micros each
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("fp_micros")) <= 7000000L)
      assert(r.getLong(r.fieldIndex("fn_micros")) <= 8000000L)
    }
    // r = 1 (OR of 32 single-row bands) collides on nearly everything:
    // it must carry the largest FP mass of the family
    val fpByR = rows.map(r =>
      r.getLong(r.fieldIndex("rows_per_band")) ->
        r.getLong(r.fieldIndex("fp_micros"))).toMap
    assert(fpByR(1L) == fpByR.values.max)
    // r = 8 (AND of 8 rows per band) is the most conservative: smallest
    // FP mass, largest FN mass
    assert(fpByR(8L) == fpByR.values.min)
  }
}
