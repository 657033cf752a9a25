package graft

import org.apache.spark.sql.functions._

import graft.functions.LayoutFunctions.{dayBucket256Sql, morton8, morton10x3, morton8x4}

/** Z-order layout keys: bijectivity of the interleave and the actual
  * pruning payoff — a 2-D box query must touch far fewer z-clustered
  * files than 1-D-sorted files, because that is the entire point of the
  * layout.
  */
class ZorderSpec extends SparkSuite {

  test("morton8 is a bijection [0,255]^2 <-> [0,65535]") {
    val s = spark
    import s.implicits._
    val grid = spark.range(0, 65536).select(
      (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val keys = grid.select(morton8(col("x"), col("y")).as("z"))
    val (n, lo, hi) = keys.agg(countDistinct("z"), min("z"), max("z"))
      .as[(Long, Long, Long)].head()
    assert(n == 65536L && lo == 0L && hi == 65535L)
  }

  test("a 64x64 box query touches 4 z-tiles vs 16 linearly-sorted files") {
    val s = spark
    import s.implicits._
    // full 256×256 key space, 1024-row files under each layout: z-files
    // are 32×32 tiles (morton DIV 1024 = the interleaved top 3+3 bits),
    // linear files are 4-row × full-width stripes of the y-sorted order
    val grid = spark.range(0, 65536).select(
      (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
      .withColumn("z", morton8(col("x"), col("y")))
      .withColumn("zfile", expr("z DIV 1024"))
      .withColumn("linfile", expr("(y * 256 + x) DIV 1024"))
    def touched(fileCol: String): Long = grid
      .groupBy(fileCol)
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      // footer-stats pruning: a file survives when its bbox intersects
      // the box x,y ∈ [0,63]²
      .filter(col("x0") <= 63 && col("x1") >= 0 &&
        col("y0") <= 63 && col("y1") >= 0)
      .count()
    assert(touched("zfile") == 4L)
    assert(touched("linfile") == 16L)
  }

  test("morton10x3 equals the bit-by-bit interleave and is injective") {
    val s = spark
    import s.implicits._
    // plain-Scala reference: bit i of x → bit 3i, y → 3i+1, z → 3i+2
    def ref(x: Long, y: Long, z: Long): Long =
      (0 until 10).foldLeft(0L) { (acc, i) =>
        acc |
          (((x >> i) & 1L) << (3 * i)) |
          (((y >> i) & 1L) << (3 * i + 1)) |
          (((z >> i) & 1L) << (3 * i + 2))
      }
    // deterministic pseudo-random sample of the 2^30 space + the corners
    val coords = (0 until 2000).map { i =>
      val h = (i * 2654435761L) & 0x3FFFFFFFL
      (h & 1023L, (h >> 10) & 1023L, (h >> 20) & 1023L)
    } ++ Seq((0L, 0L, 0L), (1023L, 1023L, 1023L), (1023L, 0L, 0L),
      (0L, 1023L, 0L), (0L, 0L, 1023L))
    val rows = coords.toDF("x", "y", "z")
      .withColumn("m", morton10x3(col("x"), col("y"), col("z")))
      .select("x", "y", "z", "m").collect()
    rows.foreach { r =>
      val exp = ref(r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == exp,
        s"(${r.getLong(0)},${r.getLong(1)},${r.getLong(2)}): " +
          s"got ${r.getLong(3)}, want $exp")
      assert(r.getLong(3) >= 0L && r.getLong(3) < (1L << 30))
    }
    // injective on the sample (bijectivity follows from the per-bit
    // construction; distinctness catches any mask typo)
    assert(rows.map(_.getLong(3)).distinct.length == coords.distinct.length)
  }

  test("3-D box query: z-tiles prune 8x better than a 1-D-sorted layout") {
    val s = spark
    import s.implicits._
    // 32³ key space (low 5 bits of each 10-bit coordinate), 512-row
    // files: z-files are 8×8×8 cubes (top 2+2+2 interleaved bits → 64
    // files), linear files are 1×32×16 slabs of the x-major sort order
    val n = 32L
    val grid = spark.range(0, n * n * n).select(
      (col("id") % n).as("x"),
      ((col("id") / n) % n).cast("long").as("y"),
      (col("id") / (n * n)).cast("long").as("z"))
      .withColumn("m", morton10x3(col("x"), col("y"), col("z")))
      .withColumn("zfile", expr("m DIV 512"))
      .withColumn("linfile", expr("(x * 1024 + y * 32 + z) DIV 512"))
    def touched(fileCol: String): Long = grid
      .groupBy(fileCol)
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"),
        min("z").as("z0"), max("z").as("z1"))
      // footer-stats pruning for the box x,y,z ∈ [0,7]³
      .filter(col("x0") <= 7 && col("x1") >= 0 &&
        col("y0") <= 7 && col("y1") >= 0 &&
        col("z0") <= 7 && col("z1") >= 0)
      .count()
    // the box IS one z-cube: 1 of 64 z-files. The linear layout touches
    // the y<16 half-plane file of every x band in the box (8 of 64) —
    // each spans the full z range, so z stats never prune it
    assert(touched("zfile") == 1L)
    assert(touched("linfile") == 8L)
  }

  test("morton8x4 equals the bit-by-bit interleave at the reference arity") {
    val s = spark
    import s.implicits._
    def ref(w: Long, x: Long, y: Long, z: Long): Long =
      (0 until 8).foldLeft(0L) { (acc, i) =>
        acc |
          (((w >> i) & 1L) << (4 * i)) |
          (((x >> i) & 1L) << (4 * i + 1)) |
          (((y >> i) & 1L) << (4 * i + 2)) |
          (((z >> i) & 1L) << (4 * i + 3))
      }
    val coords = (0 until 2000).map { i =>
      val h = (i * 2654435761L) & 0xFFFFFFFFL
      (h & 255L, (h >> 8) & 255L, (h >> 16) & 255L, (h >> 24) & 255L)
    } ++ Seq((0L, 0L, 0L, 0L), (255L, 255L, 255L, 255L),
      (255L, 0L, 0L, 0L), (0L, 0L, 0L, 255L))
    val rows = coords.toDF("w", "x", "y", "z")
      .withColumn("m",
        morton8x4(col("w"), col("x"), col("y"), col("z")))
      .collect()
    rows.foreach { r =>
      val exp = ref(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(r.getLong(4) == exp,
        s"(${r.getLong(0)},${r.getLong(1)},${r.getLong(2)},${r.getLong(3)})" +
          s": got ${r.getLong(4)}, want $exp")
      assert(r.getLong(4) >= 0L && r.getLong(4) < (1L << 32))
    }
    assert(rows.map(_.getLong(4)).distinct.length == coords.distinct.length)
  }

  test("day bucket is total: pre-1970 timestamps stay inside [0,255]") {
    val s = spark
    import s.implicits._
    // truncating DIV would give 1969-12-31 a NEGATIVE bucket and violate
    // spread8's precondition; the floor-div + wrap must land every epoch
    // distance in [0,255] and keep the morton key inside 16 bits
    val ts = Seq(
      "1969-12-31 23:59:59", // day -1 → 255 (floor-div, not trunc-to-0)
      "1969-12-31 00:00:01",
      "1955-03-14 12:00:00",
      "1901-06-05 07:08:09", // far pre-epoch
      "1970-01-01 00:00:00", // day 0
      "2024-01-03 04:05:06") // the driver corpus era, unchanged
      .toDF("s")
      .select(col("s"), to_timestamp(col("s")).as("ts"))
      .withColumn("db", expr(dayBucket256Sql("unix_micros(ts)")))
      .withColumn("z", morton8(lit(0L), col("db")))
    val rows = ts.select("s", "db", "z").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    rows.foreach { case (sv, db, z) =>
      assert(db >= 0L && db <= 255L, s"$sv bucketed to $db")
      assert(z >= 0L && z <= 65535L, s"$sv morton key $z out of 16 bits")
    }
    // floor semantics pin: the last second of 1969 is day -1 ≡ 255, not
    // day 0 — exactly where truncating DIV and floor-div disagree
    assert(rows.find(_._1.startsWith("1969-12-31 23")).get._2 == 255L)
  }
}
