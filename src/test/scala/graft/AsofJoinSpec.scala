package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSuite {

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("randomized NULLABLE-payload differential: asof == brute-force") {
    // OperatorPropertySpec's brute-force oracles run non-null payloads;
    // this adds the randomized row-tearing surface: nullable payload
    // values (a carried null from the NEWEST right row must win over an
    // older non-null one), random tolerance presence, 8 seeds. Right
    // (key, ts) pairs are unique so the reference's pick needs no
    // struct-order modeling; equal-ts left/right ties (at-or-before
    // visibility) occur constantly at this density.
    import spark.implicits._
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val nKeys = 1 + rnd.nextInt(4)
      val left = (0 until 40).map(i =>
        (rnd.nextInt(nKeys), rnd.nextInt(30).toLong, i.toLong))
      val rightMap = scala.collection.mutable.Map.empty[(Int, Long), Option[Long]]
      (0 until 40).foreach { _ =>
        val k = (rnd.nextInt(nKeys), rnd.nextInt(30).toLong)
        rightMap(k) =
          if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(1000).toLong)
      }
      val tol =
        if (rnd.nextBoolean())
          Some(java.time.Duration.ofSeconds(rnd.nextInt(10) + 1))
        else None

      val leftDf = left.map { case (k, s, id) => (k, ts(s), id) }
        .toDF("k", "lts", "id")
      val rightDf = rightMap.toSeq.map { case ((k, s), v) => (k, ts(s), v) }
        .toDF("k", "rts", "value")
      val got = AsofJoin.asof(leftDf, rightDf, "k", "lts", "rts",
          Map("value" -> "v"), tol)
        .select("id", "v").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

      val expected = left.map { case (k, s, id) =>
        val cands = rightMap.toSeq.collect {
          case ((rk, rs), v) if rk == k && rs <= s => (rs, v)
        }
        val pick = cands.sortBy(_._1).lastOption.flatMap { case (rs, v) =>
          if (tol.forall(d => (s - rs) <= d.getSeconds)) v else None
        }
        id -> pick
      }.toMap
      assert(got == expected, s"seed=$seed tol=$tol nKeys=$nKeys")
    }
  }

  test("asof picks latest right row at-or-before; null when none precedes") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(100), "L1"), (1L, ts(50), "L2"), (2L, ts(10), "L3"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(60), 6.0), (1L, ts(90), 9.0), (1L, ts(120), 12.0),
      (2L, ts(20), 2.0))
      .toDF("k", "rt", "v")
    val out = AsofJoin.asof(left, right, "k", "t", "rt",
      Map("v" -> "last_v"))
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out("L1") == 9.0)  // 90 <= 100 < 120
    assert(out("L2") == null) // no right row at-or-before t=50
    assert(out("L3") == null) // right row at t=20 is after left t=10
  }

  test("tie at equal timestamps: right row is visible (at-or-before)") {
    import spark.implicits._
    val left = Seq((1L, ts(60), "L")).toDF("k", "t", "tag")
    val right = Seq((1L, ts(60), 42.0)).toDF("k", "rt", "v")
    val out = AsofJoin.asof(left, right, "k", "t", "rt", Map("v" -> "lv"))
      .head()
    assert(out.getDouble(3) == 42.0)
  }

  test("no row tearing: newest right row's null payload value wins") {
    import spark.implicits._
    val left = Seq((1L, ts(100), 0)).toDF("k", "t", "x")
    val right = Seq(
      (1L, ts(10), Option(5.0), "old"),
      (1L, ts(20), Option.empty[Double], "new"))
      .toDF("k", "rt", "price", "tag")
    val out = AsofJoin.asof(left, right, "k", "t", "rt",
      Map("price" -> "lp", "tag" -> "lt")).head()
    // the t=20 row is the as-of match: its price is null and must NOT be
    // backfilled from the older t=10 row (per-column carry would tear)
    assert(out.isNullAt(out.fieldIndex("lp")))
    assert(out.getString(out.fieldIndex("lt")) == "new")
  }

  test("null-array inputs to sketch kernels are safe") {
    import graft.functions.HashFunctions._
    import graft.functions.TextFunctions.tokens
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select(col("id"),
        minhash(shingles(tokens(col("text")))).as("sig"),
        simhash64(tokens(col("text"))).as("sh"))
    assert(df.count() == 2) // no NPE; null text → deterministic sketches
  }

  test("tolerance masks stale matches like an absent match") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(100), "fresh"),  // match at t=90: 10 s old, within
      (1L, ts(200), "stale"),  // match at t=90: 110 s old, beyond
      (2L, ts(50), "none"))    // no preceding right row at all
      .toDF("k", "t", "tag")
    val right = Seq((1L, ts(90), 9.0)).toDF("k", "rt", "v")
    val out = AsofJoin.asof(left, right, "k", "t", "rt",
      Map("v" -> "lv"), tolerance = Some(java.time.Duration.ofSeconds(60)))
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(out("fresh") == 9.0)
    assert(out("stale") == null) // carried row exists but is too old
    assert(out("none") == null)
    // boundary is inclusive: exactly tolerance-old still matches
    val edge = AsofJoin.asof(
      Seq((1L, ts(150), "edge")).toDF("k", "t", "tag"), right,
      "k", "t", "rt", Map("v" -> "lv"),
      tolerance = Some(java.time.Duration.ofSeconds(60))).head()
    assert(edge.getDouble(3) == 9.0)
  }

  test("multiple payload columns carry together") {
    import spark.implicits._
    val left = Seq((1L, ts(100), 0)).toDF("k", "t", "x")
    val right = Seq((1L, ts(10), 1.0, "a"), (1L, ts(20), 2.0, "b"))
      .toDF("k", "rt", "v", "s")
    val out = AsofJoin.asof(left, right, "k", "t", "rt",
      Map("v" -> "lv", "s" -> "ls")).head()
    val lv = out.getDouble(out.fieldIndex("lv"))
    val ls = out.getString(out.fieldIndex("ls"))
    assert(lv == 2.0 && ls == "b")
  }
}
