package graft

import org.apache.spark.sql.functions._

import graft.operators.SetSketch
import graft.queries.Dedup

/** Theta set-algebra telemetry vs exact set arithmetic on the driver
  * corpus: per-source shingle sketches must estimate pairwise
  * intersection sizes within the sketch's error envelope. At the test
  * SFs the per-source shingle space (~1.4k at sf0.01) sits below the
  * 2^12 retention threshold, so theta runs in exact mode — the envelope
  * still allows the sampled regime's ~2 % so the test keeps passing if
  * the corpus outgrows the threshold.
  */
class SetSketchSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  private lazy val shingleSets: Map[String, Set[String]] =
    Dedup.sourceShingles(spark, sf)
      .select("source", "shingle").distinct().collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap

  test("pairwise overlap estimates sit inside the error envelope") {
    val sketches = SetSketch.shardSketches(
      Dedup.sourceShingles(spark, sf), "shingle", Seq("source"))
    val est = SetSketch.pairwiseOverlap(sketches, "source").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(est.nonEmpty, "no source pairs — degenerate fixture")
    est.foreach { case ((sa, sb), (na, nb, nOv)) =>
      val ea = shingleSets(sa).size.toDouble
      val eb = shingleSets(sb).size.toDouble
      val eOv = (shingleSets(sa) & shingleSets(sb)).size.toDouble
      assert(math.abs(na - ea) <= 0.02 * ea + 1, s"$sa size: $na vs $ea")
      assert(math.abs(nb - eb) <= 0.02 * eb + 1, s"$sb size: $nb vs $eb")
      // intersection error compounds two sketches — 4 % + absolute slack
      assert(math.abs(nOv - eOv) <= 0.04 * eOv + 2,
        s"($sa,$sb) overlap: $nOv vs $eOv")
      assert(eOv > 0, s"($sa,$sb) disjoint — overlap check is vacuous")
    }
  }

  test("sketch state survives a parquet round-trip") {
    val dir = "target/theta-roundtrip"
    SetSketch.shardSketches(
        Dedup.sourceShingles(spark, sf), "shingle", Seq("source"))
      .write.mode("overwrite").parquet(dir)
    val est = SetSketch.pairwiseOverlap(
        spark.read.parquet(dir), "source").collect()
    est.foreach { r =>
      val eOv = (shingleSets(r.getString(0)) & shingleSets(r.getString(1)))
        .size.toDouble
      assert(math.abs(r.getDouble(4) - eOv) <= 0.04 * eOv + 2,
        s"post-roundtrip overlap drifted for (${r.getString(0)},${r.getString(1)})")
    }
  }
}
