package graft.api

import org.apache.spark.sql.DataFrame

import graft.interp.GridBuilder
import graft.model.RegularGrid

/** Variable metadata parsed from the reference's `name[units]` column
  * naming convention, regex `(\w+)\[(.*?)\]`
  * (`kamodo_dask/kamodo_dask.py:330-332`); a bare column name is a variable
  * with empty units.
  */
final case class VarMeta(name: String, units: String, column: String)

object VarMeta {
  private val NameUnits = """(\w+)\[(.*?)\]""".r

  def parse(column: String): Option[VarMeta] = column match {
    case NameUnits(n, u) => Some(VarMeta(n, u, column))
    case _ => None
  }
}

/** The functional registry — the engine's equivalent of the reference's
  * Kamodo object surface (`kamodo_dask.py:301-357`): every unit-suffixed
  * variable column of a fetched grid window becomes a named, unit-carrying
  * interpolating function with point evaluation, meshgrid ("gridify")
  * evaluation, bounds and midpoint probes.
  *
  * Divergence by design: the reference's loop captures the interpolator
  * late-bound, so with >1 variable every registered function evaluates the
  * *last* column's grid (`kamodo_dask.py:328-351`, SURVEY §2.8). The
  * intended per-variable semantics are implemented here.
  */
final class GridFields(
    val fields: Map[String, (VarMeta, RegularGrid)],
    val axisNames: Seq[String]) extends Serializable {

  def names: Seq[String] = fields.keys.toSeq.sorted
  def units(name: String): String = fields(name)._1.units
  def grid(name: String): RegularGrid = fields(name)._2

  /** Point evaluation — reference `kd.rho(xvec)` (`kamodo_dask.py:339-341`);
    * each point is (time_epoch_s, lon, lat, h).
    */
  def eval(name: String, points: Array[Array[Double]]): Array[Double] = {
    val g = grid(name)
    points.map(g.interpolate)
  }

  def eval(name: String, point: Array[Double]): Double =
    grid(name).interpolate(point)

  /** Meshgrid evaluation — reference `kd.rho_ijkl(time=…, lon=…)` via
    * `@gridify` (`kamodo_dask.py:345-351`): evaluates on the cartesian
    * product of the supplied per-axis arrays, each axis defaulting to the
    * full grid axis. Output is C-order over the effective axes.
    */
  def gridEval(name: String, overrides: Map[String, Array[Double]] = Map.empty)
      : (Array[Array[Double]], Array[Double]) = {
    val unknown = overrides.keySet -- axisNames.toSet
    require(unknown.isEmpty,
      s"unknown axis name(s) ${unknown.mkString(",")}; axes are ${axisNames.mkString(",")}")
    val g = grid(name)
    val effAxes = axisNames.zipWithIndex.map { case (an, i) =>
      overrides.getOrElse(an, g.axes(i))
    }.toArray
    (effAxes, g.meshEval(effAxes))
  }

  /** Per-axis (min, max) — reference `get_bounds` (`kamodo_dask.py:353-354`). */
  def bounds(name: String): Map[String, (Double, Double)] =
    axisNames.zip(grid(name).bounds).toMap

  /** Per-axis mean of distinct grid planes — reference `get_midpoint`
    * (`kamodo_dask.py:356-357`).
    */
  def midpoint(name: String): Map[String, Double] =
    axisNames.zip(grid(name).midpoint).toMap

  /** Re-express a registered variable in compatible units — the unit
    * algebra the reference gets from kamodo-core's `@kamodofy(units=…)`
    * registration (`kamodo_dask.py:339,345`): kamodo inserts the
    * multiplicative factor when a function is re-registered in different
    * units. Returns a new registry (immutable, like the grid itself) with
    * that variable's grid values AND fill value scaled by
    * [[Units.factor]]; every other variable is untouched. Throws on
    * dimensionally-incompatible units.
    */
  def convert(name: String, toUnits: String): GridFields = {
    val (meta, g) = fields(name)
    val c = Units.factor(meta.units, toUnits)
    val scaled = new RegularGrid(
      g.axes, g.values.map(_ * c), g.fillValue * c)
    // column is re-derived so the `name[units]` invariant holds: the old
    // source-frame column name would contradict the registry's units
    val newMeta = meta.copy(units = toUnits, column = s"$name[$toUnits]")
    new GridFields(fields.updated(name, (newMeta, scaled)), axisNames)
  }

  /** Register a DERIVED variable — kamodo's compose-new-functions-from-
    * registered-ones workflow (`kd['p_total'] = 'p1 + p2'` in
    * kamodo-core; the reference inherits it through KamodoDask): a
    * pointwise combination of existing variables over their SHARED axes.
    * The inputs must be registered on identical axes (the reference's
    * variables always are — one window, one grid); the combined grid is
    * built eagerly, cell by cell, so evaluation cost afterwards is
    * identical to a fetched variable's. `units` is validated through the
    * unit algebra at registration (a malformed unit string fails HERE,
    * not at a later convert).
    */
  def derived(name: String, units: String, inputs: Seq[String])(
      f: Seq[Double] => Double): GridFields = {
    require(!fields.contains(name), s"variable '$name' already registered")
    require(inputs.nonEmpty, "derived variable needs at least one input")
    val missing = inputs.filterNot(fields.contains)
    require(missing.isEmpty,
      s"unregistered input variable(s): ${missing.mkString(",")}")
    Units.parse(units) // validate eagerly
    val grids = inputs.map(grid)
    val axes0 = grids.head.axes
    grids.zip(inputs).tail.foreach { case (g, in) =>
      require(g.axes.length == axes0.length &&
        g.axes.zip(axes0).forall { case (a, b) => a.sameElements(b) },
        s"input '$in' is not on the same axes as '${inputs.head}'")
    }
    val values = Array.tabulate(grids.head.values.length) { i =>
      f(grids.map(_.values(i)))
    }
    // refuse NaN cells loudly: RegularGrid construction rewrites NaN to
    // the fill value (correct for FETCHED grids — the reference's
    // fillna-at-build), which here would silently blend an arbitrary
    // sentinel into in-hull results (e.g. a 0/0 from a zero denominator)
    val nanAt = values.indexWhere(_.isNaN)
    require(nanAt < 0,
      s"combiner produced NaN at cell $nanAt — an in-hull NaN would be " +
        "silently replaced by the fill value; fix the combiner or mask " +
        "the inputs first")
    val fillValue = f(grids.map(_.fillValue))
    val meta = VarMeta(name, units, s"$name[$units]")
    new GridFields(
      fields.updated(name, (meta, new RegularGrid(axes0, values, fillValue))),
      axisNames)
  }

  /** LaTeX of one registered function, kamodo-notebook style:
    * `\rho{\left(t,lon,lat,h \right)}[\frac{kg}{m^{3}}]`.
    */
  def latex(name: String): String =
    Latex.func(name, axisNames, units(name))

  /** LaTeX of the whole registry (kamodo's `_repr_latex_`): one
    * begin/end `equation` per registered function, sorted by name.
    */
  def reprLatex: String =
    names.map(n => s"\\begin{equation}${latex(n)}\\end{equation}")
      .mkString("\n")

  /** Slice data for plotting — the reference's
    * `kd.plot('rho_ijkl', plot_partial=dict(rho_ijkl=dict(lon=200, …)))`
    * (`docs/interpolator.md:352-386`) minus the plotly render: pin some
    * axes to scalar values, interpolate on the cartesian product of the
    * remaining full grid axes, and return a DataFrame of the free axis
    * columns plus the (unit-carrying) value column, C-order flattened.
    * Bounded by the registered grid size — this is the driver tier by
    * construction, same as the reference's in-memory interpolator.
    */
  def plotSlice(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      partial: Map[String, Double]): DataFrame = {
    val overrides = partial.map { case (ax, v) => ax -> Array(v) }
    val (effAxes, vals) = gridEval(name, overrides)
    val free = axisNames.zipWithIndex.filterNot { case (an, _) =>
      partial.contains(an)
    }
    // C-order unflatten: row r's index on effective axis i
    val lens = effAxes.map(_.length)
    val strides = lens.scanRight(1)(_ * _).tail
    val rows = vals.zipWithIndex.map { case (v, r) =>
      org.apache.spark.sql.Row.fromSeq(
        free.map { case (_, i) => effAxes(i)((r / strides(i)) % lens(i)) } :+ v)
    }
    val schema = org.apache.spark.sql.types.StructType(
      free.map { case (an, _) =>
        org.apache.spark.sql.types.StructField(
          an, org.apache.spark.sql.types.DoubleType, nullable = false)
      } :+ org.apache.spark.sql.types.StructField(
        name, org.apache.spark.sql.types.DoubleType, nullable = false))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }
}

object GridFields {

  /** Attach the parsed `name[units]` metadata to each variable column's
    * `StructField` (SURVEY §1.2's Spark-native carrier for unit metadata:
    * `MetadataBuilder.putString("units", …)`), keeping the original
    * columns. Downstream consumers read `df.schema(c).metadata`.
    */
  def withUnitsMetadata(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.MetadataBuilder
    df.columns.foldLeft(df) { (acc, c) =>
      VarMeta.parse(c) match {
        case Some(m) =>
          val md = new MetadataBuilder()
            .putString("name", m.name).putString("units", m.units).build()
          acc.withColumn(c, col(s"`$c`").as(c, md))
        case None => acc
      }
    }
  }

  /** Register every `name[units]` column of a long-form grid window
    * (driver-mode tier; SURVEY §2.8 tier 1). Non-matching columns that are
    * not axes are ignored, like the reference ignores nothing — it assumes
    * all non-index columns are variables; explicit `extraVars` opts bare
    * columns in.
    */
  def fromDataFrame(df: DataFrame, fillValue: Double = 0.0,
      axisCols: Seq[String] = GridBuilder.DefaultAxes,
      extraVars: Seq[String] = Seq.empty): GridFields = {
    val metas = df.columns.filterNot(axisCols.contains).toSeq
      .flatMap(VarMeta.parse) ++
      extraVars.map(c => VarMeta(c, "", c))
    require(metas.nonEmpty, "no name[units] variable columns found")
    val dups = metas.groupBy(_.name).collect { case (n, ms) if ms.size > 1 => n }
    require(dups.isEmpty,
      s"duplicate variable name(s) after unit stripping: ${dups.mkString(",")}")
    val grids = GridBuilder.fromLongForm(df, metas.map(_.column), axisCols, fillValue)
    new GridFields(
      metas.map(m => m.name -> (m, grids(m.column))).toMap,
      axisCols)
  }
}
