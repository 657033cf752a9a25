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
    * \frac{m}{s}`, `nT → nT`, `1/cm^3 → \frac{1}{cm^{3}}`. Consumes
    * [[Units.tokenize]] — the SAME tokenizer the conversion algebra
    * uses, so the two cannot drift on what counts as well-formed. A
    * string the tokenizer rejects (VarMeta's bracket regex accepts
    * anything, e.g. `kg//m`) renders verbatim instead of throwing:
    * display must not crash where `convert` would error loudly.
    */
  def unitsLatex(expr: String): String = {
    if (expr.trim.isEmpty) return ""
    val toks =
      try Units.tokenize(expr)
      catch { case _: IllegalArgumentException => return expr.trim }
    val num = scala.collection.mutable.ArrayBuffer.empty[String]
    val den = scala.collection.mutable.ArrayBuffer.empty[String]
    toks.foreach { case (divide, tok) =>
      val rendered = tok.split('^') match {
        case Array(n) => n
        case Array(n, e) => s"$n^{$e}"
        case _ => tok
      }
      (if (divide) den else num) += rendered
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
