package graft

import scala.util.Random

import graft.operators.PageRank

/** PageRank operator vs an exact driver-side power iteration, on random
  * weighted digraphs that include dangling nodes (no out-edges) — the
  * case the distributed dangling-mass redistribution must get right for
  * rank mass to stay 1.
  */
class PageRankSpec extends SparkSuite {

  private def reference(edges: Seq[(Long, Long, Double)], d: Double,
      iters: Int): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length.toDouble
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(outw.contains).map(rank).sum
      val contrib = edges
        .groupBy(_._2).view.mapValues(
          _.map { case (s, _, w) => rank(s) * w / outw(s) }.sum).toMap
      rank = nodes.map { v =>
        v -> ((1 - d) / n + d * (contrib.getOrElse(v, 0.0) + dang / n))
      }.toMap
    }
    rank
  }

  test("matches exact power iteration on random graphs with dangling nodes") {
    import spark.implicits._
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      // ~40 nodes; node ids above 30 never get out-edges → dangling
      val edges = Seq.fill(120) {
        (rnd.nextInt(30).toLong, rnd.nextInt(40).toLong,
          (rnd.nextInt(9) + 1).toDouble)
      }.distinct
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq // unique (src,dst)
        .filter { case (s, t, _) => s != t }
      val df = edges.toDF("src", "dst", "w")
      val got = PageRank.run(df, damping = 0.85, iters = 8)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = reference(edges, 0.85, 8)
      assert(got.keySet == want.keySet, s"trial $trial node sets differ")
      // mass conservation: dangling redistribution keeps sum(rank) = 1
      assert(math.abs(got.values.sum - 1.0) < 1e-9,
        s"trial $trial mass ${got.values.sum}")
      want.foreach { case (v, r) =>
        assert(math.abs(got(v) - r) < 1e-9, s"trial $trial node $v")
      }
      df.sparkSession.catalog.clearCache()
    }
  }

  test("rejects bad damping and iteration counts") {
    import spark.implicits._
    val df = Seq((1L, 2L, 1.0)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException](PageRank.run(df, damping = 1.0))
    intercept[IllegalArgumentException](PageRank.run(df, iters = 0))
  }
}
