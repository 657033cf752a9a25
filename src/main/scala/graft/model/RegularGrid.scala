package graft.model

import java.util.Arrays

/** Dense N-dimensional regular (rectilinear) grid with multilinear
  * interpolation.
  *
  * Re-implements, from the textbook algorithm, the behavior the reference
  * gets from `scipy.interpolate.RegularGridInterpolator(levels, data,
  * bounds_error=False, fill_value=fv)` (reference
  * `kamodo_dask/kamodo_dask.py:335-338`):
  *
  *   - cell located per-axis by binary search on the sorted axis array;
  *   - value blended from the 2^d bracketing corners with per-axis linear
  *     weights;
  *   - any point outside the hull returns `fillValue` instead of erroring
  *     (the reference's deliberate "allow out of bounds query" choice,
  *     `WorkLog.md:38-39`);
  *   - NaN cells are replaced by `fillValue` at construction (the reference
  *     does `fillna(fill_value)` before building, `kamodo_dask.py:334`).
  *
  * Degenerate axes of length 1 are allowed: that dimension contributes no
  * blending and any query value on it must equal the single coordinate
  * (otherwise the point is out of bounds). This covers single-timestep
  * windows.
  *
  * The grid is immutable and serializable, so it can be shipped to executors
  * via `SparkContext.broadcast` (broadcast-mode interpolation, SURVEY §2.8
  * tier 2).
  *
  * @param axes   sorted, strictly increasing coordinate arrays, one per dim
  * @param values dense row-major (C-order) values, length = product of axis
  *               lengths; index layout matches
  *               `reshape(n_0, n_1, …, n_{d-1})` of a frame sorted by
  *               (axis_0, axis_1, …, axis_{d-1})
  */
final class RegularGrid(
    val axes: Array[Array[Double]],
    rawValues: Array[Double],
    val fillValue: Double = 0.0)
    extends Serializable {

  val dims: Int = axes.length
  require(dims >= 1, "at least one axis required")

  // grid size in Long to catch Int overflow on huge axes before it wraps
  private val sizeL: Long = axes.foldLeft(1L)(_ * _.length)
  require(sizeL <= Int.MaxValue, s"grid size $sizeL exceeds Int.MaxValue")

  /** C-order strides per dimension. */
  val strides: Array[Int] = {
    val s = new Array[Int](dims)
    s(dims - 1) = 1
    var i = dims - 2
    while (i >= 0) { s(i) = s(i + 1) * axes(i + 1).length; i -= 1 }
    s
  }

  require(
    rawValues.length.toLong == sizeL,
    s"values length ${rawValues.length} != grid size $sizeL")
  axes.foreach { a =>
    require(a.nonEmpty, "empty axis")
    var i = 1
    while (i < a.length) { require(a(i - 1) < a(i), "axis not strictly increasing"); i += 1 }
  }

  /** Cell values; NaN cells behave as fillValue (reference fillna-at-build
    * semantics). The caller's array is cloned before filling iff it
    * contains NaNs — construction never mutates its input.
    */
  val values: Array[Double] = {
    var hasNaN = false
    var i = 0
    while (i < rawValues.length && !hasNaN) { hasNaN = rawValues(i).isNaN; i += 1 }
    if (!hasNaN) rawValues
    else {
      val v = rawValues.clone()
      i = 0
      while (i < v.length) { if (v(i).isNaN) v(i) = fillValue; i += 1 }
      v
    }
  }

  /** min/max per axis — the interpolation hull. */
  def bounds: Array[(Double, Double)] = axes.map(a => (a(0), a(a.length - 1)))

  /** mean of distinct axis values per axis (reference `get_midpoint`,
    * `kamodo_dask.py:356-357` takes the mean of index *levels*, i.e. of the
    * distinct sorted coordinates — not of the data rows).
    */
  def midpoint: Array[Double] = axes.map(a => a.sum / a.length)

  /** Locate the cell index i for coordinate x on axis `d`: largest i with
    * axis(i) <= x and i <= n-2 (so the cell [i, i+1] is valid), or -1 if x
    * is outside [axis(0), axis(n-1)]. A length-1 axis returns 0 iff x equals
    * its only coordinate.
    */
  private def locate(d: Int, x: Double): Int = {
    val a = axes(d)
    val n = a.length
    if (x < a(0) || x > a(n - 1) || x.isNaN) return -1
    if (n == 1) return 0
    val idx = Arrays.binarySearch(a, x)
    val cell = if (idx >= 0) idx else -idx - 2
    math.min(cell, n - 2)
  }

  /** Multilinear interpolation at the given point (length == dims).
    * Out-of-hull or NaN coordinates → fillValue.
    */
  def interpolate(point: Array[Double]): Double = {
    // Per-axis cell index and fractional weight toward the upper corner.
    val cell = new Array[Int](dims)
    val frac = new Array[Double](dims)
    var d = 0
    while (d < dims) {
      val i = locate(d, point(d))
      if (i < 0) return fillValue
      cell(d) = i
      val a = axes(d)
      frac(d) = if (a.length == 1) 0.0
      else {
        val lo = a(i); val hi = a(i + 1)
        (point(d) - lo) / (hi - lo)
      }
      d += 1
    }
    // Blend 2^d corners. Corner bit b on axis d selects cell(d)+1.
    var acc = 0.0
    val corners = 1 << dims
    var c = 0
    while (c < corners) {
      var w = 1.0
      var off = 0
      var d2 = 0
      while (d2 < dims) {
        val upper = ((c >> d2) & 1) == 1
        val f = frac(d2)
        // skip degenerate upper corners on length-1 axes (f = 0 ⇒ w = 0)
        w *= (if (upper) f else 1.0 - f)
        off += (cell(d2) + (if (upper && axes(d2).length > 1) 1 else 0)) * strides(d2)
        d2 += 1
      }
      if (w != 0.0) acc += w * values(off)
      c += 1
    }
    acc
  }

  /** Nearest-neighbor evaluation at the given point — the
    * `method="nearest"` mode of the reference's interpolator class
    * (`scipy RegularGridInterpolator(..., method=...)`; the reference
    * leaves the default "linear", but the class surface carries both):
    * per axis the nearer bracketing plane wins, an exact midpoint
    * resolves to the LOWER plane (scipy's `norm_distances <= 0.5`
    * rule — the comparison below is the same IEEE subtract-and-compare
    * on both engine and oracle), out-of-hull or NaN coordinates →
    * fillValue, same as [[interpolate]].
    */
  def interpolateNearest(point: Array[Double]): Double = {
    val idx = new Array[Int](dims)
    var d = 0
    while (d < dims) {
      val i = locate(d, point(d))
      if (i < 0) return fillValue
      val a = axes(d)
      idx(d) =
        if (a.length == 1) 0
        else if (point(d) - a(i) <= a(i + 1) - point(d)) i
        else i + 1
      d += 1
    }
    at(idx)
  }

  /** Value at exact grid indices (no interpolation). */
  def at(indices: Array[Int]): Double = {
    var off = 0
    var d = 0
    while (d < dims) { off += indices(d) * strides(d); d += 1 }
    values(off)
  }

  /** Evaluate on the cartesian product of the given per-axis coordinate
    * arrays (the reference's `gridify` meshgrid evaluation,
    * `kamodo_dask.py:345-348`), C-order output.
    */
  def meshEval(queryAxes: Array[Array[Double]]): Array[Double] = {
    require(queryAxes.length == dims)
    val lens = queryAxes.map(_.length)
    val totalL = lens.foldLeft(1L)(_ * _)
    require(totalL <= Int.MaxValue, s"mesh size $totalL exceeds Int.MaxValue")
    val total = totalL.toInt
    val out = new Array[Double](total)
    val point = new Array[Double](dims)
    val idx = new Array[Int](dims)
    var i = 0
    while (i < total) {
      var rem = i
      var d = dims - 1
      while (d >= 0) { idx(d) = rem % lens(d); rem /= lens(d); d -= 1 }
      d = 0
      while (d < dims) { point(d) = queryAxes(d)(idx(d)); d += 1 }
      out(i) = interpolate(point)
      i += 1
    }
    out
  }
}

object RegularGrid {
  /** 4-D convenience constructor matching the reference's (time, lon, lat, h)
    * layout (`kamodo_dask.py:325-338`); time axis in float seconds since
    * epoch (`kamodo_dask.py:308-313`).
    */
  def grid4d(
      time: Array[Double], lon: Array[Double], lat: Array[Double],
      h: Array[Double], values: Array[Double], fillValue: Double = 0.0): RegularGrid =
    new RegularGrid(Array(time, lon, lat, h), values, fillValue)
}
