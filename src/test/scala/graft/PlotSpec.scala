package graft

import com.fasterxml.jackson.databind.ObjectMapper

import graft.api.{GridFields, Plot}
import graft.source.GridFixtures

/** Plotly-figure rendering of registered interpolators — the reference's
  * `kd.plot('rho_ijkl', plot_partial=…)` (`docs/interpolator.md:352-386`)
  * as a figure-JSON document. Assertions parse the emitted JSON with
  * Jackson (already on the Spark classpath) and check values against the
  * fixtures' analytic multilinear fields, which the interpolator must
  * reproduce exactly on grid points.
  */
class PlotSpec extends SparkSuite {

  private val mapper = new ObjectMapper()

  private lazy val kd: GridFields = {
    val dir = GridFixtures.ensure(spark, "plot", n = 3)
    graft.api.Graft.fetch(spark, dir,
      GridFixtures.t0, GridFixtures.t0.plusSeconds(1200),
      hLo = GridFixtures.hAxis.head, hHi = GridFixtures.hAxis.last)
  }

  test("one free axis renders a scatter line with exact values") {
    val mid = kd.midpoint("T")
    val fig = mapper.readTree(Plot.figure(kd, "T",
      Map("time" -> mid("time"), "lon" -> 40.0, "lat" -> 20.0)))
    val trace = fig.get("data").get(0)
    assert(trace.get("type").asText() == "scatter")
    val x = trace.get("x")
    val y = trace.get("y")
    assert(x.size() == GridFixtures.hAxis.length && y.size() == x.size())
    GridFixtures.hAxis.indices.foreach { i =>
      assert(x.get(i).asDouble() == GridFixtures.hAxis(i))
      val expect =
        GridFixtures.temperature(mid("time"), 40.0, 20.0, GridFixtures.hAxis(i))
      assert(math.abs(y.get(i).asDouble() - expect) < 1e-9,
        s"h=${GridFixtures.hAxis(i)}: ${y.get(i).asDouble()} vs $expect")
    }
    assert(fig.get("layout").get("yaxis").get("title").get("text").asText()
      .contains("[K]"))
  }

  test("two free axes render a heatmap with z[y][x] orientation") {
    val mid = kd.midpoint("rho")
    val fig = mapper.readTree(Plot.figure(kd, "rho",
      Map("time" -> mid("time"), "h" -> 287500.0)))
    val trace = fig.get("data").get(0)
    assert(trace.get("type").asText() == "heatmap")
    val x = trace.get("x") // lon (first free axis)
    val y = trace.get("y") // lat (second free axis)
    val z = trace.get("z")
    assert(x.size() == GridFixtures.lonAxis.length)
    assert(y.size() == GridFixtures.latAxis.length)
    assert(z.size() == y.size() && z.get(0).size() == x.size())
    for (b <- GridFixtures.latAxis.indices; a <- GridFixtures.lonAxis.indices) {
      val expect = GridFixtures.rho(mid("time"),
        GridFixtures.lonAxis(a), GridFixtures.latAxis(b), 287500.0)
      assert(math.abs(z.get(b).get(a).asDouble() - expect) < 1e-21)
    }
    assert(trace.get("colorbar").get("title").get("text").asText()
      == "rho [kg/m^3]")
  }

  test("zero or three-plus free axes are refused like the reference") {
    val mid = kd.midpoint("T")
    intercept[IllegalArgumentException] {
      Plot.figure(kd, "T", Map("time" -> mid("time"))) // 3 free axes
    }
    intercept[IllegalArgumentException] {
      Plot.figure(kd, "T", Map("time" -> mid("time"), "lon" -> 0.0,
        "lat" -> 0.0, "h" -> mid("h"))) // fully pinned
    }
  }
}
