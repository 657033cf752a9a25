package graft.api

/** LaTeX rendering of registered interpolators — the display half of the
  * reference's registration step: `@kamodofy(units=units)` hands kamodo-core
  * a function that renders in a notebook as
  * `\rho{\left(t,lon,lat,h \right)}[\frac{kg}{m^{3}}]`
  * (`kamodo_dask/kamodo_dask.py:339-351`; the rendered form is visible
  * throughout `docs/interpolator.md`). The engine reproduces the same
  * notation from the parsed `name[units]` metadata: greek-letter variable
  * names become their LaTeX commands, a `_suffix` becomes a subscript
  * (`rho_ijkl → \rho_{ijkl}`), and the unit expression renders as a
  * `\frac` when it has a denominator.
  *
  * Pure string formatting on driver-side metadata — no plan impact; the
  * DATA a plot consumes comes from `GridFields.gridEval`/`plotSlice`.
  */
object Latex {

  private val greek = Set(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu", "nu", "xi", "pi", "rho", "sigma",
    "tau", "upsilon", "phi", "chi", "psi", "omega",
    "Gamma", "Delta", "Theta", "Lambda", "Xi", "Pi", "Sigma", "Upsilon",
    "Phi", "Psi", "Omega")

  /** `rho → \rho`, `rho_ijkl → \rho_{ijkl}`, `T_e → T_{e}`, `foo → foo`. */
  def symbol(name: String): String = {
    val (base, sub) = name.indexOf('_') match {
      case -1 => (name, "")
      case i => (name.substring(0, i), name.substring(i + 1))
    }
    val b = if (greek.contains(base)) s"\\$base" else base
    if (sub.isEmpty) b else s"${b}_{$sub}"
  }

  /** Unit expression → LaTeX: `kg/m^3 → \frac{kg}{m^{3}}`, `m/s →
    * \frac{m}{s}`, `nT → nT`, `1/cm^3 → \frac{1}{cm^{3}}`. Uses the same
    * left-associative `*`/`/` split as [[Units.parse]], so anything the
    * algebra accepts renders.
    */
  def unitsLatex(expr: String): String = {
    val text = expr.replaceAll("\\s+", "")
    if (text.isEmpty) return ""
    val num = scala.collection.mutable.ArrayBuffer.empty[String]
    val den = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var divide = false
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text(i) == '*' || text(i) == '/') {
        val tok = text.substring(start, i)
        val rendered = tok.split('^') match {
          case Array(n) => n
          case Array(n, e) => s"$n^{$e}"
          case _ => tok
        }
        (if (divide) den else num) += rendered
        if (i < text.length) divide = text(i) == '/'
        start = i + 1
      }
      i += 1
    }
    val n = if (num.isEmpty || num == Seq("1")) "1" else num.mkString(" \\, ")
    if (den.isEmpty) n
    else s"\\frac{$n}{${den.mkString(" \\, ")}}"
  }

  /** One registered function: `\rho{\left(t,lon,lat,h \right)}[\frac{kg}{m^{3}}]`. */
  def func(name: String, args: Seq[String], units: String): String = {
    val u = if (units.isEmpty) "" else s"[${unitsLatex(units)}]"
    s"${symbol(name)}{\\left(${args.mkString(",")} \\right)}$u"
  }
}
