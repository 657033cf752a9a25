package graft.api

/** Plot rendering of registered interpolators — the engine's counterpart
  * of the reference's `kd.plot('rho_ijkl', plot_partial=…)`
  * (`/root/reference/docs/interpolator.md:352-386`,
  * `kamodo_dask/kamodo_dask.py:350-351`). Kamodo's `plot` builds a Plotly
  * figure from the gridified slice and hands it to the notebook to draw;
  * the figure itself IS a JSON document. This object produces that
  * document — a self-contained Plotly-schema figure string — so a caller
  * can `Files.writeString("fig.json", …)` and render it with any Plotly
  * runtime (plotly.js, `plotly.io.from_json`, a notebook). Only the
  * browser draw is out of scope, which is genuinely not a JVM engine's
  * job.
  *
  * Trace choice mirrors kamodo's gridify plots: 1 free axis → `scatter`
  * line; 2 free axes → `heatmap` (first free axis = x, second = y,
  * `z[y][x]` row-major as Plotly expects). 0 or ≥3 free axes is an error,
  * exactly where the reference's plot either collapses to a point or
  * refuses to render (`docs/interpolator.md:369` "this will not render").
  *
  * Everything here runs on the driver over the registered grid — the same
  * bounded driver tier as [[GridFields.plotSlice]]; no Spark job.
  */
object Plot {

  /** JSON-escape + render a double the way Plotly accepts (no NaN/Inf
    * literals in strict JSON — Plotly's own `to_json` writes null).
    */
  private def num(d: Double): String =
    if (d.isNaN || d.isInfinite) "null"
    else if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def arr(xs: Array[Double]): String =
    xs.map(num).mkString("[", ",", "]")

  private def str(s: String): String = graft.util.Json.str(s)

  /** Build the Plotly figure JSON for a partial-evaluation slice of a
    * registered variable. `partial` pins axes to scalars; the remaining
    * 1 or 2 grid axes are the plot dimensions (full grid axis each, like
    * the reference's gridify defaults).
    */
  def figure(gf: GridFields, name: String,
      partial: Map[String, Double]): String = {
    // validate BEFORE evaluating: free axes are known from the names
    // alone, and a refused call must not pay a full-grid meshEval
    val unknown = partial.keySet -- gf.axisNames.toSet
    require(unknown.isEmpty,
      s"unknown axis name(s) ${unknown.mkString(",")}; axes are " +
        gf.axisNames.mkString(","))
    val free = gf.axisNames.zipWithIndex.filterNot { case (an, _) =>
      partial.contains(an)
    }
    require(free.nonEmpty,
      "all axes pinned — a fully-pinned evaluation is a point, not a plot" +
        " (use eval)")
    require(free.size <= 2,
      s"${free.size} free axes (${free.map(_._1).mkString(",")}) — pin " +
        "down to 1 (line) or 2 (heatmap) with plot_partial, like the " +
        "reference")
    val overrides = partial.map { case (ax, v) => ax -> Array(v) }
    val (effAxes, vals) = gf.gridEval(name, overrides)
    val units = gf.units(name)
    val title = str(Latex.func(name, gf.axisNames, units))
    val valueTitle = str(if (units.isEmpty) name else s"$name [$units]")

    // C-order strides over the effective axes (pinned axes have length 1,
    // so they contribute nothing to the free-axis unflatten)
    val lens = effAxes.map(_.length)
    val strides = lens.scanRight(1)(_ * _).tail

    free match {
      case Seq((xName, xi)) =>
        val x = effAxes(xi)
        s"""{"data":[{"type":"scatter","mode":"lines","name":${str(name)},""" +
          s""""x":${arr(x)},"y":${arr(vals)}}],""" +
          s""""layout":{"title":{"text":$title},""" +
          s""""xaxis":{"title":{"text":${str(xName)}}},""" +
          s""""yaxis":{"title":{"text":$valueTitle}}}}"""
      case Seq((xName, xi), (yName, yi)) =>
        val x = effAxes(xi)
        val y = effAxes(yi)
        // z[y][x]: Plotly heatmap rows are y. The flattened value index of
        // (xi=a, yi=b) is a*strides(xi) + b*strides(yi) (all pinned axes
        // contribute index 0).
        val z = y.indices.map { b =>
          arr(x.indices.map(a => vals(a * strides(xi) + b * strides(yi)))
            .toArray)
        }.mkString("[", ",", "]")
        s"""{"data":[{"type":"heatmap","name":${str(name)},""" +
          s""""x":${arr(x)},"y":${arr(y)},"z":$z,""" +
          s""""colorbar":{"title":{"text":$valueTitle}}}],""" +
          s""""layout":{"title":{"text":$title},""" +
          s""""xaxis":{"title":{"text":${str(xName)}}},""" +
          s""""yaxis":{"title":{"text":${str(yName)}}}}}"""
      case _ => throw new IllegalStateException("unreachable")
    }
  }
}
