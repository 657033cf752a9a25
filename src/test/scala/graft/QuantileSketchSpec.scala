package graft

import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch

/** KLL mergeable-quantile telemetry — verified in RANK space (the
  * property KLL actually guarantees): the exact rank of every estimated
  * quantile value must sit within the sketch's normalized rank-error
  * envelope of the requested rank. Value-space comparison would be
  * meaningless on heavy tails (a 1 % rank slip can move the p99 VALUE
  * arbitrarily). Mirrors ProfilingSpec's CMS treatment: estimates are
  * envelope-checked against exact, not hash-gated (KLL state is not
  * merge-order invariant, so a cross-engine hash would flake).
  */
class QuantileSketchSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"
  private val probs = Seq(0.5, 0.9, 0.95, 0.99)
  // k=200 → ~1.65 % single-sketch rank error; two-level merge and the
  // finite fixture add slack — 3 % is still far tighter than the gap
  // any wrong implementation (e.g. unweighted merge) produces
  private val eps = 0.03

  private def exactRank(values: Array[Double], v: Double): Double =
    values.count(_ <= v).toDouble / values.length

  test("rolled-up shard sketches hit every quantile within the rank envelope") {
    val li = Tables.lineitem(spark, sf)
    val sketches = QuantileSketch.shardSketches(
      li, "l_extendedprice", Seq("l_returnflag", "l_linestatus"))
    // global rollup: merge across ALL shards
    val est = QuantileSketch.rollupQuantiles(sketches, Seq.empty, probs)
      .head().getSeq[Double](0)
    val all = li.select(col("l_extendedprice")).collect().map(_.getDouble(0))
    probs.zip(est).foreach { case (p, v) =>
      val r = exactRank(all, v)
      assert(math.abs(r - p) <= eps,
        s"global p$p estimate $v has exact rank $r (off by ${r - p})")
    }
    // grouped rollup: per returnflag, merging only that flag's shards
    val byFlag = QuantileSketch.rollupQuantiles(
      sketches, Seq("l_returnflag"), probs).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val flags = li.select("l_returnflag").distinct().collect()
      .map(_.getString(0))
    flags.foreach { f =>
      val vs = li.filter(col("l_returnflag") === f)
        .select(col("l_extendedprice")).collect().map(_.getDouble(0))
      probs.zip(byFlag(f)).foreach { case (p, v) =>
        val r = exactRank(vs, v)
        assert(math.abs(r - p) <= eps, s"flag $f p$p rank $r")
      }
    }
  }

  test("sketch state survives a parquet round-trip and still merges") {
    val li = Tables.lineitem(spark, sf)
    val dir = "target/kll-roundtrip"
    QuantileSketch.shardSketches(
        li, "l_extendedprice", Seq("l_returnflag", "l_linestatus"))
      .write.mode("overwrite").parquet(dir)
    val est = QuantileSketch.rollupQuantiles(
        spark.read.parquet(dir), Seq.empty, probs)
      .head().getSeq[Double](0)
    val all = li.select(col("l_extendedprice")).collect().map(_.getDouble(0))
    probs.zip(est).foreach { case (p, v) =>
      assert(math.abs(exactRank(all, v) - p) <= eps,
        s"post-roundtrip p$p drifted")
    }
  }

  test("rollup from shards agrees with a direct group-level sketch") {
    val li = Tables.lineitem(spark, sf)
    // same data sketched at (flag, status) then merged to flag, vs
    // sketched directly at flag — different merge trees, both must land
    // inside the envelope of the same exact distribution (they need not
    // be bit-equal; KLL is not merge-order invariant)
    val merged = QuantileSketch.rollupQuantiles(
        QuantileSketch.shardSketches(li, "l_extendedprice",
          Seq("l_returnflag", "l_linestatus")),
        Seq("l_returnflag"), probs).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val direct = QuantileSketch.rollupQuantiles(
        QuantileSketch.shardSketches(li, "l_extendedprice",
          Seq("l_returnflag")),
        Seq("l_returnflag"), probs).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    merged.keys.foreach { f =>
      val vs = li.filter(col("l_returnflag") === f)
        .select(col("l_extendedprice")).collect().map(_.getDouble(0))
      probs.indices.foreach { i =>
        val rm = exactRank(vs, merged(f)(i))
        val rd = exactRank(vs, direct(f)(i))
        assert(math.abs(rm - probs(i)) <= eps && math.abs(rd - probs(i)) <= eps,
          s"flag $f p${probs(i)}: merged rank $rm, direct rank $rd")
      }
    }
  }
}
