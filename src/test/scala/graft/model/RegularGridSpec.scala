package graft.model

import org.scalatest.funsuite.AnyFunSuite

class RegularGridSpec extends AnyFunSuite {

  private val tAxis = Array(0.0, 600.0, 1200.0)
  private val lonAxis = (0 to 18).map(_ * 20.0).toArray // 0..360
  private val latAxis = (-4 to 4).map(_ * 20.0).toArray // -80..80
  private val hAxis = (0 to 12).map(250000.0 + _ * 12500.0).toArray

  /** analytic multilinear field — interpolation must reproduce it exactly */
  private def field(t: Double, lon: Double, lat: Double, h: Double): Double =
    1.5 + 2e-3 * t + 0.25 * lon - 0.5 * lat + 1e-4 * h

  private def denseValues(f: (Double, Double, Double, Double) => Double): Array[Double] = {
    val out = new Array[Double](tAxis.length * lonAxis.length * latAxis.length * hAxis.length)
    var i = 0
    for (t <- tAxis; lo <- lonAxis; la <- latAxis; h <- hAxis) {
      out(i) = f(t, lo, la, h); i += 1
    }
    out
  }

  private lazy val grid =
    RegularGrid.grid4d(tAxis, lonAxis, latAxis, hAxis, denseValues(field), fillValue = -999.0)

  /** deterministic property sampling: n random points inside the hull */
  private def samplePoints(n: Int, seed: Long)(body: (Double, Double, Double, Double) => Unit): Unit = {
    val rnd = new scala.util.Random(seed)
    def in(a: Array[Double]) = a.head + rnd.nextDouble() * (a.last - a.head)
    (1 to n).foreach(_ => body(in(tAxis), in(lonAxis), in(latAxis), in(hAxis)))
  }

  test("exact at every grid node") {
    for (t <- tAxis; lo <- lonAxis; la <- latAxis; h <- hAxis) {
      val got = grid.interpolate(Array(t, lo, la, h))
      assert(math.abs(got - field(t, lo, la, h)) < 1e-9, s"node ($t,$lo,$la,$h)")
    }
  }

  test("multilinear field reproduced exactly at random interior points") {
    samplePoints(500, seed = 1) { (t, lo, la, h) =>
      val got = grid.interpolate(Array(t, lo, la, h))
      assert(math.abs(got - field(t, lo, la, h)) < 1e-6)
    }
  }

  test("out-of-bounds returns fillValue on every axis, both sides") {
    val mid = grid.midpoint
    for (d <- 0 until 4; delta <- Seq(-1.0, 1.0)) {
      val p = mid.clone()
      p(d) = (if (delta < 0) grid.axes(d).head else grid.axes(d).last) + delta
      assert(grid.interpolate(p) == -999.0, s"axis $d side $delta")
    }
  }

  test("NaN coordinate returns fillValue") {
    assert(grid.interpolate(Array(Double.NaN, 0.0, 0.0, 250000.0)) == -999.0)
  }

  test("NaN cell values are filled with fillValue at construction") {
    val vals = denseValues(field)
    vals(0) = Double.NaN
    val g = RegularGrid.grid4d(tAxis, lonAxis, latAxis, hAxis, vals, fillValue = 7.0)
    assert(g.interpolate(Array(tAxis(0), lonAxis(0), latAxis(0), hAxis(0))) == 7.0)
  }

  test("result contained within corner min/max (monotone containment)") {
    val rnd = new scala.util.Random(42)
    val vals = Array.fill(grid.values.length)(rnd.nextDouble() * 100)
    val g = RegularGrid.grid4d(tAxis, lonAxis, latAxis, hAxis, vals)
    samplePoints(500, seed = 2) { (t, lo, la, h) =>
      val got = g.interpolate(Array(t, lo, la, h))
      assert(got >= 0.0 - 1e-9 && got <= 100.0 + 1e-9)
    }
  }

  test("degenerate length-1 axis (single timestep)") {
    val g = RegularGrid.grid4d(
      Array(600.0), lonAxis, latAxis, hAxis,
      (for (lo <- lonAxis; la <- latAxis; h <- hAxis) yield field(600.0, lo, la, h)).toArray,
      fillValue = -1.0)
    assert(math.abs(g.interpolate(Array(600.0, 10.0, 5.0, 260000.0))
      - field(600.0, 10.0, 5.0, 260000.0)) < 1e-9)
    // off the single time plane → out of bounds
    assert(g.interpolate(Array(601.0, 10.0, 5.0, 260000.0)) == -1.0)
  }

  test("meshEval matches pointwise interpolate, C-order") {
    val qt = Array(300.0, 900.0)
    val qlon = Array(10.0, 30.0, 50.0)
    val qlat = Array(-10.0)
    val qh = Array(251000.0, 399000.0)
    val out = grid.meshEval(Array(qt, qlon, qlat, qh))
    assert(out.length == 2 * 3 * 1 * 2)
    var i = 0
    for (t <- qt; lo <- qlon; la <- qlat; h <- qh) {
      assert(math.abs(out(i) - grid.interpolate(Array(t, lo, la, h))) < 1e-12)
      i += 1
    }
  }

  test("bounds and midpoint") {
    assert(grid.bounds(0) == ((0.0, 1200.0)))
    assert(grid.bounds(3) == ((250000.0, 400000.0)))
    assert(math.abs(grid.midpoint(0) - 600.0) < 1e-12)
    assert(math.abs(grid.midpoint(2) - 0.0) < 1e-12)
  }

  test("nearest: exact at nodes, rounds to nearest plane, midpoint → lower") {
    // exact node hits return the node value
    for (t <- tAxis; h <- Seq(hAxis.head, hAxis.last)) {
      val got = grid.interpolateNearest(Array(t, 40.0, 20.0, h))
      assert(got == field(t, 40.0, 20.0, h), s"node ($t, $h)")
    }
    // interior points snap per-axis to the nearer plane
    val got = grid.interpolateNearest(Array(100.0, 359.0, -75.0, 251000.0))
    assert(got == field(0.0, 360.0, -80.0, 250000.0))
    // exact midpoints resolve to the LOWER plane on every axis (scipy's
    // norm_distances <= 0.5 rule)
    val mid = grid.interpolateNearest(Array(300.0, 10.0, -70.0, 256250.0))
    assert(mid == field(0.0, 0.0, -80.0, 250000.0))
    // just past the midpoint → upper
    val up = grid.interpolateNearest(Array(300.1, 10.1, -69.9, 256250.1))
    assert(up == field(600.0, 20.0, -60.0, 262500.0))
    // out of hull → fillValue, same as linear
    assert(grid.interpolateNearest(Array(-1.0, 0.0, 0.0, 250000.0)) == -999.0)
    // nearest of the analytic-linear field never strays outside the
    // bracketing corners' range (sanity over random points)
    samplePoints(200, seed = 12L) { (t, lo, la, h) =>
      val v = grid.interpolateNearest(Array(t, lo, la, h))
      assert(!v.isNaN && v != -999.0)
    }
  }
}
