package graft

import org.apache.spark.sql.functions._

import graft.operators.FloodPairs

/** The distributed flood-pairing operator (VERDICT r10's one named
  * `weak`, closed): rank-adjacent pairs inside monster buckets without
  * any single task ever holding a whole bucket. The reference semantics
  * is the old `row_number() OVER (PARTITION BY bucket ORDER BY id)`
  * window + rank-window self-join — recomputed here locally in Scala —
  * and the operator must reproduce its pair set exactly for any
  * grouping, id spacing, boundary placement, or bucket size.
  */
class FloodPairsSpec extends SparkSuite {

  import spark.implicits._

  /** Local reference: all (a, b) with rank(b) − rank(a) ∈ [1, w] in id
    * order per key.
    */
  private def reference(rows: Seq[(String, Long)], w: Int)
      : Set[(String, Long, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (k, members) =>
      val ordered = members.map(_._2).sorted
      for {
        (i, ri) <- ordered.zipWithIndex
        j <- ordered.slice(ri + 1, ri + 1 + w)
      } yield (k, i, j)
    }.toSet

  private def run(rows: Seq[(String, Long)], w: Int)
      : Set[(String, Long, Long)] = {
    val (pairs, cache) =
      FloodPairs.rankAdjacent(rows.toDF("k", "vec_id"), Seq("k"), "vec_id", w)
    val got = pairs
      .select(col("a.k"), col("a.vec_id"), col("b.vec_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    cache.unpersist(blocking = false)
    got
  }

  test("matches the window formulation on interleaved buckets with " +
    "non-contiguous ids") {
    // ranks != ids: ids are sparse and deliberately interleaved across
    // three buckets of different sizes (30 / 7 / 1); the singleton and
    // a sub-window bucket exercise the empty-pair edges
    val rng = new scala.util.Random(42)
    val ids = rng.shuffle((0L until 400L).toList).take(38)
    val rows = ids.zipWithIndex.map { case (id, i) =>
      (if (i < 30) "flood" else if (i < 37) "small" else "lone", id * 13 + 5)
    }
    assert(run(rows, w = 8) == reference(rows, w = 8))
    assert(run(rows, w = 1) == reference(rows, w = 1))
  }

  test("monster bucket spanning many rank chunks pairs across chunk " +
    "boundaries and stays distributed") {
    // 2500 rows in ONE bucket crosses the ChunkRows=1024 chunking twice:
    // a missed (ck, ck+1) probe would lose exactly the pairs straddling
    // ranks 1024/1025 and 2048/2049
    val rows = (0L until 2500L).map(i => ("mega", i * 3))
    val df = rows.toDF("k", "vec_id")
    val (pairs, cache) = FloodPairs.rankAdjacent(df, Seq("k"), "vec_id", 8)
    val got = pairs.select(col("a.vec_id"), col("b.vec_id"))
    // expected: sum_{d=1..8} (2500 - d) pairs, every (i, i+3d) for d<=8
    assert(got.count() == (1 to 8).map(2500 - _).sum)
    val sample = got.filter(col("a.vec_id").isin(3069L, 3072L, 6141L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // rank 1024 has vec_id 3069 (= 1023*3); its window reaches into the
    // next chunk; same at the 2048 boundary (vec_id 6141)
    assert((1 to 8).forall(d => sample.contains((3069L, 3069L + 3 * d))))
    assert((1 to 8).forall(d => sample.contains((6141L, 6141L + 3 * d))))
    // the distribution contract: no Window in the executed plan is
    // partitioned by the bucket key ALONE — every rank window includes
    // the range-partition id, so a task's sort is bounded by the range
    // granularity, never by bucket size
    val plan = got.queryExecution.executedPlan.toString
    val windowSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    val rankSpecs = windowSpecs.filterNot(_.contains("_pid"))
    // (the offsets cumulative sum partitions by key over the TINY
    // per-segment count frame — that one is allowed; it never sees the
    // flood rows themselves, so distinguish by the ordered column)
    assert(rankSpecs.forall(s => !s.contains("vec_id")),
      s"a rank window sorts whole buckets on one task: $rankSpecs")
    cache.unpersist(blocking = false)
  }

  test("output is invariant to the shuffle-partition count") {
    val rows = (0L until 600L).map(i => (s"b${i % 3}", i * 7 + 1))
    val base = run(rows, w = 5)
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try assert(run(rows, w = 5) == base)
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  /** Pivot-arm reference: the adjacency set plus every (a, b) with
    * rank(a) ≤ p and rank(b) > rank(a) + w.
    */
  private def referencePivots(rows: Seq[(String, Long)], w: Int, p: Int)
      : Set[(String, Long, Long)] =
    reference(rows, w) ++ rows.groupBy(_._1).toSeq.flatMap {
      case (k, members) =>
        val ordered = members.map(_._2).sorted
        for {
          (i, ri) <- ordered.zipWithIndex if ri < p
          j <- ordered.drop(ri + 1 + w)
        } yield (k, i, j)
    }.toSet

  test("pivot arm: the bucket's first P members pair with EVERY later " +
    "member, across chunk boundaries, disjoint from the adjacency arm " +
    "(VERDICT r11 ask #3)") {
    // 2500 rows in one bucket (crosses ChunkRows=1024 twice) plus a
    // small second bucket: the pivot side must explode over the big
    // bucket's full chunk range or it silently loses the distant pairs
    val rows = (0L until 2500L).map(i => ("mega", i * 3)) ++
      (0L until 40L).map(i => ("small", i * 11 + 1))
    val df = rows.toDF("k", "vec_id")
    val (pairs, cache) =
      FloodPairs.rankAdjacent(df, Seq("k"), "vec_id", 8, pivots = 4)
    val got = pairs
      .select(col("a.k"), col("a.vec_id"), col("b.vec_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // no duplicate emissions: the two arms are disjoint by construction
    assert(got.length == got.toSet.size, "pivot/adjacency arms overlap")
    assert(got.toSet == referencePivots(rows, w = 8, p = 4))
    // the property the arm exists for: a pivot reaches a member 2000
    // ranks away (far past the window) in the same bucket
    assert(got.toSet.contains(("mega", 0L, 2400L * 3)))
    cache.unpersist(blocking = false)
  }
}
