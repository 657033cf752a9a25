package graft

import org.apache.spark.sql.functions._

import graft.operators.BandedPairs

/** The capped-safe minimal-band single emission (dd4 / mm5 / mm7's
  * candidate machinery): the fast path must reproduce EXACTLY the
  * distinct pair set of the capped bucket join — same pairs, same
  * Hamming scores, each pair exactly once — in both regimes (nothing
  * capped, and a genuinely over-cap bucket decided in-row from the
  * driver-collected oversize keys).
  */
class BandedPairsSpec extends SparkSuite {

  private val Bands = 8
  private val Bits = 8

  private def slice(h: Long, b: Int): Long = (h >>> (Bits * b)) & 0xffL

  /** Reference semantics, computed naively: pair (i, j) is a candidate
    * iff some band's slices are equal AND that (band, slice) bucket has
    * ≤ cap members; its score is the exact Hamming distance.
    */
  private def expectedPairs(hs: Map[Long, Long], cap: Long)
      : Set[(Long, Long, Int)] = {
    val bucketSize: Map[(Int, Long), Int] =
      hs.values.toSeq
        .flatMap(h => (0 until Bands).map(b => (b, slice(h, b))))
        .groupBy(identity).map { case (k, v) => k -> v.size }
    val ids = hs.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      if (0 until Bands).exists(b =>
        slice(hs(i), b) == slice(hs(j), b) &&
          bucketSize((b, slice(hs(i), b))) <= cap)
    } yield (i, j, java.lang.Long.bitCount(hs(i) ^ hs(j)))).toSet
  }

  private def run(hs: Map[Long, Long], floor: Long)
      : (Set[(Long, Long, Int)], Long, Long) = {
    val s = spark
    import s.implicits._
    val df = hs.toSeq.toDF("id", "h").persist()
    val (scored, cap, caches) =
      BandedPairs.minimalBandScoredPairs(df, "id", "h", Bands, Bits, floor)
    val rows = scored.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    (df +: caches).foreach(_.unpersist(blocking = false))
    // exactly-once: no pair may be emitted from two bands
    assert(rows.length == rows.toSet.size,
      "a pair was emitted more than once")
    (rows.toSet, cap, rows.length.toLong)
  }

  test("uncapped corpus: emission equals the naive banded pair set, " +
      "each pair exactly once") {
    // 40 hashes in 4 collision families (shared low byte) + unique high
    // bytes; several pairs share MULTIPLE bands (identical hashes would
    // share all 8) to exercise the minimal-band pick
    val hs: Map[Long, Long] = (0L until 40L).map { i =>
      val family = i % 4
      val h = (family * 0x11L) | (i << 8) | ((i * 0x9E3779B9L) << 24)
      i -> h
    }.toMap
    val (got, cap, _) = run(hs, floor = 1000L)
    assert(got == expectedPairs(hs, cap))
    assert(got.nonEmpty)
  }

  test("capped corpus: the in-row survival rule reproduces the capped " +
      "join's pair set") {
    // one flooded (band 0, slice 0xAA) bucket with 30 members, 990
    // near-singleton others: p99.9 of occupancy stays at the floor, so
    // the flood bucket is over cap and must contribute NO pairs — but
    // its members must still pair through their OTHER (surviving) bands
    val flood = (0L until 30L).map { i =>
      // byte 0 = 0xAA for all (the flood); bytes 1-2 collide pairwise
      // (i / 2) so flood members still meet through surviving bands;
      // bytes 3-7 scrambled per member so the flood does not form
      // secondary 30-member buckets that would drag the p99.9 cap up
      i -> (0xAAL | ((i / 2) << 8) | ((i / 2) << 16) |
        ((i * 0x9E3779B97F4A7C15L) & 0xFFFFFFFFFF000000L))
    }
    val rest = (100L until 1090L).map { i =>
      // golden-gamma mix scrambles bytes 1-7 (~4 members per bucket);
      // byte 0 cycles 1..100 (~10 members, sub-cap, never the flood's
      // 0xAA) so band 0 stays busy but healthy
      val mix = i * 0x9E3779B97F4A7C15L
      i -> ((mix & ~0xffL) | ((i % 100) + 1))
    }
    val hs = (flood ++ rest).toMap
    val (got, cap, _) = run(hs, floor = 4L)
    // the flood is real: its bucket exceeds the derived cap
    assert(30L > cap, s"test setup: flood bucket must exceed cap $cap")
    assert(got == expectedPairs(hs, cap))
    // flood members still found each other via surviving bands
    assert(got.exists { case (i, j, _) => i < 30L && j < 30L })
  }

  test("identical hashes (all 8 bands shared) still emit exactly once " +
      "with Hamming 0") {
    val hs = Map(1L -> 0x123456789ABCDEFL, 2L -> 0x123456789ABCDEFL,
      3L -> 0x123456789ABCDE0L)
    val (got, cap, _) = run(hs, floor = 1000L)
    assert(got == expectedPairs(hs, cap))
    assert(got.contains((1L, 2L, 0)))
  }
}
