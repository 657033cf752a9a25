package graft.model

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based interpolator laws (SURVEY §5 test plan #2):
  * node exactness, per-axis linearity, monotone containment, out-of-hull
  * fill — over randomly generated rectilinear grids and points.
  */
class RegularGridPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val axisGen: Gen[Array[Double]] = for {
    n <- Gen.choose(2, 8)
    start <- Gen.choose(-1000.0, 1000.0)
    steps <- Gen.listOfN(n - 1, Gen.choose(0.5, 50.0))
  } yield steps.scanLeft(start)(_ + _).toArray

  private case class GridCase(grid: RegularGrid, axes: Array[Array[Double]])

  private val gridGen: Gen[GridCase] = for {
    t <- axisGen; lon <- axisGen; lat <- axisGen; h <- axisGen
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val axes = Array(t, lon, lat, h)
    val rnd = new scala.util.Random(seed)
    val vals = Array.fill(t.length * lon.length * lat.length * h.length)(
      rnd.nextDouble() * 200 - 100)
    GridCase(new RegularGrid(axes, vals, fillValue = -12345.0), axes)
  }

  private def inHull(gc: GridCase, fracs: Seq[Double]): Array[Double] =
    gc.axes.zip(fracs).map { case (a, f) => a.head + f * (a.last - a.head) }

  private val fracGen = Gen.listOfN(4, Gen.choose(0.0, 1.0))

  test("exact at every grid node (random grids)") {
    check(Prop.forAll(gridGen) { gc =>
      val idx = Array(0, gc.axes(1).length - 1, 1 % gc.axes(2).length, 0)
      val p = idx.zipWithIndex.map { case (i, d) => gc.axes(d)(i) }
      math.abs(gc.grid.interpolate(p) - gc.grid.at(idx)) < 1e-9
    })
  }

  test("monotone containment: result within global value bounds") {
    check(Prop.forAll(gridGen, fracGen) { (gc, fr) =>
      val v = gc.grid.interpolate(inHull(gc, fr))
      v >= -100.0 - 1e-9 && v <= 100.0 + 1e-9
    })
  }

  test("linearity along each axis: midpoint value = mean of cell endpoints") {
    check(Prop.forAll(gridGen, fracGen, Gen.choose(0, 3)) { (gc, fr, d) =>
      val p = inHull(gc, fr)
      val a = gc.axes(d)
      // snap dimension d to a cell's endpoints and its midpoint
      val cell = math.min(a.length - 2,
        math.max(0, java.util.Arrays.binarySearch(a, p(d)) match {
          case i if i >= 0 => i
          case i => -i - 2
        }))
      def at(x: Double): Double = {
        val q = p.clone(); q(d) = x; gc.grid.interpolate(q)
      }
      val mid = (a(cell) + a(cell + 1)) / 2
      math.abs(at(mid) - (at(a(cell)) + at(a(cell + 1))) / 2) < 1e-6
    })
  }

  test("out-of-hull on any axis returns fillValue") {
    check(Prop.forAll(gridGen, Gen.choose(0, 3), Gen.oneOf(true, false)) {
      (gc, d, below) =>
        val p = inHull(gc, Seq(0.5, 0.5, 0.5, 0.5))
        p(d) = if (below) gc.axes(d).head - 1.0 else gc.axes(d).last + 1.0
        gc.grid.interpolate(p) == -12345.0
    })
  }
}
