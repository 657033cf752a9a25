package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bucketed range join: result equivalence with the naive BETWEEN join,
  * interval edge cases, and the no-nested-loop plan guarantee that is the
  * operator's whole point.
  */
class RangeJoinSpec extends SparkSuite {

  test("bucketed join equals the naive BETWEEN join on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val points = Seq.fill(500)(rnd.nextDouble() * 100.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("pid", "p")
    val ivs = Seq.fill(80) {
      val lo = rnd.nextDouble() * 100.0
      (lo, lo + rnd.nextDouble() * 10.0)
    }.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("iid", "lo", "hi")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = canon(RangeJoin.pointInInterval(
      points, ivs, "p", "lo", "hi", bucketWidth = 7.0))
    val naive = canon(points.join(ivs,
      col("p") >= col("lo") && col("p") <= col("hi")))
    assert(got == naive)
  }

  test("optimizer rule rescues the naive BETWEEN spelling into an equi-join") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val points = Seq.fill(400)(rnd.nextDouble() * 100.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("pid", "p")
    val ivs = Seq.fill(60) {
      val lo = rnd.nextDouble() * 100.0
      (lo, lo + rnd.nextDouble() * 8.0)
    }.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("iid", "lo", "hi")
    def naive() = points.join(ivs,
      col("p") >= col("lo") && col("p") <= col("hi"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // truth, rule off (BNLJ is fine at spec scale)
    val truth = canon(naive())
    val before = naive().queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoopJoin"),
      "control is stale: the naive spelling no longer plans a BNLJ")
    GraftExtensions.register(spark) // rule registered but width unset: no-op
    assert(naive().queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "rule must not fire without an explicit width conf")
    spark.conf.set(graft.plans.RangeJoinRewrite.WidthConf, "5.0")
    try {
      val rescued = naive()
      val after = rescued.queryExecution.executedPlan.toString
      assert(!after.contains("BroadcastNestedLoopJoin") &&
          !after.contains("CartesianProduct"),
        s"rule did not fire:\n${after.take(1500)}")
      assert(canon(rescued) == truth,
        "rewrite changed the join result")
      // an already-equi join must be left alone (guard, not a rewrite)
      val equi = points.join(ivs, col("pid") === col("iid") &&
        col("p") >= col("lo") && col("p") <= col("hi"))
      assert(!equi.queryExecution.optimizedPlan.toString
        .contains("_graft_range_bucket"))
    } finally spark.conf.unset(graft.plans.RangeJoinRewrite.WidthConf)
  }

  test("interval edges: boundary-inclusive, inverted intervals match nothing") {
    import spark.implicits._
    val points = Seq((1L, 5.0), (2L, 10.0), (3L, 10.5)).toDF("pid", "p")
    val ivs = Seq(
      (10L, 5.0, 10.0),  // closed: both boundary points match
      (11L, 8.0, 3.0),   // inverted: matches nothing (not a desc sequence)
      (12L, 10.5, 10.5)) // degenerate single point
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", 2.0)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 12L)))
  }

  test("adaptive width matches the naive join on skewed interval sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val points = Seq.fill(400)(rnd.nextDouble() * 1000.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("pid", "p")
    // Heavily skewed lengths: many tiny intervals, a few mega-intervals,
    // degenerate points, and one inverted interval — the distributions a
    // hard-coded width gets wrong in one direction or the other.
    val ivs = (
      Seq.tabulate(60) { i =>           // tiny: len ~ 0.01
        val lo = rnd.nextDouble() * 1000.0; (i.toLong, lo, lo + 0.01)
      } ++ Seq.tabulate(5) { i =>       // mega: len ~ 900
        val lo = rnd.nextDouble() * 100.0; (60L + i, lo, lo + 900.0)
      } ++ Seq((65L, 500.0, 500.0),     // degenerate single point
        (66L, 300.0, 200.0))            // inverted: matches nothing
    ).toDF("iid", "lo", "hi")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = canon(RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi"))
    val naive = canon(points.join(ivs,
      col("p") >= col("lo") && col("p") <= col("hi")))
    assert(got == naive)
  }

  test("adaptive width is the median interval length; degenerate sets fall back") {
    import spark.implicits._
    val ivs = Seq((0L, 0.0, 4.0), (1L, 10.0, 16.0), (2L, 20.0, 30.0))
      .toDF("iid", "lo", "hi")
    val w = RangeJoin.adaptiveWidth(ivs, "lo", "hi")
    assert(w >= 4.0 && w <= 10.0, s"median of {4,6,10} expected, got $w")
    val degenerate = Seq((0L, 5.0, 5.0), (1L, 9.0, 9.0)).toDF("iid", "lo", "hi")
    assert(RangeJoin.adaptiveWidth(degenerate, "lo", "hi") == 1.0)
    val empty = Seq.empty[(Long, Double, Double)].toDF("iid", "lo", "hi")
    assert(RangeJoin.adaptiveWidth(empty, "lo", "hi") == 1.0)
  }

  test("adaptive width caps the worst interval's fan-out on heavy tails") {
    import spark.implicits._
    // 500 tiny intervals (len 0.01) plus one mega interval (len 1e7):
    // median-only width (0.01) would explode the mega interval into 1e9
    // bucket rows — sequence-limit / executor-OOM territory. The clamp
    // must raise the width so no interval spans more than
    // MaxBucketsPerInterval buckets, without changing the join result.
    val ivs = (Seq.tabulate(500) { i =>
      val lo = i * 10.0; (i.toLong, lo, lo + 0.01)
    } :+ ((500L, 0.0, 1.0e7))).toDF("iid", "lo", "hi")
    val w = RangeJoin.adaptiveWidth(ivs, "lo", "hi")
    assert(w >= 1.0e7 / RangeJoin.MaxBucketsPerInterval,
      s"width $w lets the mega interval exceed the bucket cap")
    val points = Seq(
      (0L, 4990.005), // inside tiny iid=499 AND the mega interval
      (1L, 5.0),      // inside the mega interval only
      (2L, 2.0e7))    // outside everything
      .toDF("pid", "p")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = canon(RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi"))
    val naive = canon(points.join(ivs,
      col("p") >= col("lo") && col("p") <= col("hi")))
    assert(got == naive && got.contains((0L, 499L)) && got.contains((1L, 500L)))
  }

  test("interval overlap equals the naive join, each pair exactly once") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val as = Seq.fill(120) {
      val lo = rnd.nextDouble() * 100.0
      (lo, lo + rnd.nextDouble() * 20.0) // wide: spans many buckets
    }.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("aid", "a_lo", "a_hi")
    val bs = (Seq.fill(80) {
      val lo = rnd.nextDouble() * 100.0
      (lo, lo + rnd.nextDouble() * 5.0)
    } ++ Seq((50.0, 40.0))) // inverted: matches nothing
      .zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("bid", "b_lo", "b_hi")
    // tiny width FORCES wide pairs to meet in many buckets — the
    // first-common-bucket rule must still emit each pair exactly once
    val got = RangeJoin.intervalOverlap(
        as, bs, "a_lo", "a_hi", "b_lo", "b_hi", bucketWidth = 0.5)
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "a pair was emitted more than once")
    // the naive reference needs the empty-interval rule made explicit:
    // the raw overlap formula can "match" an inverted interval (lo=50,
    // hi=40 satisfies a_lo <= 40 && 50 <= a_hi for a wide a), while the
    // operator's declared semantics are BETWEEN-like — inverted is empty
    val naive = as.filter(col("a_lo") <= col("a_hi"))
      .join(bs.filter(col("b_lo") <= col("b_hi")),
        col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet == naive)
    // adaptive-width overload agrees too
    val adaptive = RangeJoin.intervalOverlap(
        as, bs, "a_lo", "a_hi", "b_lo", "b_hi")
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(adaptive == naive)
  }

  test("q27 plans an equi-join, not a nested-loop scan") {
    val p = SparkEntry.queries("q27_interval_overlap")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q24 plans an equi-join, not a nested-loop scan") {
    val p = SparkEntry.queries("q24_range_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"),
      p.linesIterator.take(5).mkString("\n"))
    assert(!p.contains("CartesianProduct"))
  }
}
