package graft

import org.apache.spark.sql.functions._

import graft.functions.LayoutFunctions.morton8

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
}
