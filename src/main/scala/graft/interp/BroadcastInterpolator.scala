package graft.interp

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

import graft.model.RegularGrid

/** Tier-2 interpolation (SURVEY §2.8): ship the dense grid to every executor
  * once via `SparkContext.broadcast` and evaluate an arbitrarily large
  * DataFrame of query points with a scalar UDF — the distributed upgrade of
  * the reference's driver-only `rgi(xvec)` evaluation
  * (`kamodo_dask/kamodo_dask.py:339-341`), suitable while the grid itself
  * fits in executor memory (≤ a few GB).
  */
final class BroadcastInterpolator(bc: Broadcast[RegularGrid]) extends Serializable {

  /** Column expression interpolating at (time, lon, lat, h); time must
    * already be in double epoch-seconds (`cast("double")` on a timestamp).
    */
  def apply(time: Column, lon: Column, lat: Column, h: Column): Column = {
    val g = bc
    val f = udf((t: Double, lo: Double, la: Double, hh: Double) =>
      g.value.interpolate(Array(t, lo, la, hh)))
    f(time, lon, lat, h)
  }

  def grid: RegularGrid = bc.value
}

object BroadcastInterpolator {
  def apply(spark: SparkSession, grid: RegularGrid): BroadcastInterpolator =
    new BroadcastInterpolator(spark.sparkContext.broadcast(grid))
}
