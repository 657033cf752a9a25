package graft.api

/** Unit-expression algebra for registered variables — the conversion layer
  * the reference delegates to kamodo-core via `@kamodofy(units=units)`
  * (`kamodo_dask/kamodo_dask.py:339,345`): kamodo parses the bracketed
  * unit string and auto-inserts multiplicative conversion factors when a
  * user re-expresses a variable in compatible units. The engine implements
  * the same algebra natively, without any symbolic-math dependency:
  * `GridFields.convert` rescales a registered grid on the driver, and the
  * Column-level [[Units.convertColumn]] folds the same factor into a
  * distributed projection.
  *
  * Representation: a unit expression is reduced to
  * `(mantissa, pow10, dims)` where `dims` is the SI dimension exponent
  * vector (m, kg, s, A, K, mol, cd). Powers of ten are carried as an
  * INTEGER exponent, not folded into the mantissa, so purely decimal
  * conversions (`kg/m^3 → g/cm^3`, `m → km`, `Pa → nPa`) produce the
  * correctly-rounded decimal double (`10^-3` is exactly the same bits as a
  * SQL literal `0.001`) — which is what lets a converted query hash-match
  * a DuckDB oracle that writes the factor as a decimal literal. Non-decimal
  * units (min, eV, bar…) contribute to the mantissa and are float-exact
  * only to 1 ulp per operation.
  *
  * Grammar (covers the unit strings in the reference's data and docs —
  * `kg/m^3`, `m/s`, `nPa`, `nT`, `1/cm^3`, `erg/cm^3`):
  * {{{
  *   expr   := factor (('*' | '/') factor)*      // left-associative
  *   factor := name ('^' '-'? digits)?
  *   name   := known unit | SI-prefix + known unit | '1'
  * }}}
  * `a/b/c` therefore means `a / b / c = a / (b·c)`, matching sympy's
  * parsing of sequential division.
  */
object Units {

  /** SI dimension exponents (length m, mass kg, time s, current A,
    * temperature K, amount mol, luminous intensity cd).
    */
  final case class Dims(
      m: Int = 0, kg: Int = 0, s: Int = 0, a: Int = 0,
      k: Int = 0, mol: Int = 0, cd: Int = 0) {
    def *(o: Dims): Dims =
      Dims(m + o.m, kg + o.kg, s + o.s, a + o.a, k + o.k, mol + o.mol, cd + o.cd)
    def /(o: Dims): Dims =
      Dims(m - o.m, kg - o.kg, s - o.s, a - o.a, k - o.k, mol - o.mol, cd - o.cd)
    def pow(e: Int): Dims =
      Dims(m * e, kg * e, s * e, a * e, k * e, mol * e, cd * e)
    def isDimensionless: Boolean = this == Dims()
    override def toString: String = {
      val parts = Seq("m" -> m, "kg" -> kg, "s" -> s, "A" -> a,
        "K" -> k, "mol" -> mol, "cd" -> cd).collect {
        case (n, 1) => n
        case (n, e) if e != 0 => s"$n^$e"
      }
      if (parts.isEmpty) "1" else parts.mkString("*")
    }
  }

  /** A reduced unit value: `mantissa * 10^pow10` in SI base units of
    * dimension `dims`.
    */
  final case class UnitVal(mantissa: Double, pow10: Int, dims: Dims) {
    def *(o: UnitVal): UnitVal =
      UnitVal(mantissa * o.mantissa, pow10 + o.pow10, dims * o.dims)
    def /(o: UnitVal): UnitVal =
      UnitVal(mantissa / o.mantissa, pow10 - o.pow10, dims / o.dims)
    def pow(e: Int): UnitVal = {
      var m = 1.0
      var i = 0
      val steps = math.abs(e)
      while (i < steps) { m = if (e > 0) m * mantissa else m / mantissa; i += 1 }
      UnitVal(m, pow10 * e, dims.pow(e))
    }
  }

  private val one = UnitVal(1.0, 0, Dims())

  // Base + derived units. Mass base is the kilogram (dims.kg), but the
  // TABLE entry is the gram (pow10 = -3) so prefixing composes: "kg" =
  // prefix k + g = 10^3 * 10^-3 = 10^0. "T" (tesla) outranks the
  // tera- prefix because exact-name lookup happens before prefix
  // splitting — same resolution order sympy uses ("nT" still parses:
  // no unit is literally named "nT", so it falls through to n + T).
  private val table: Map[String, UnitVal] = Map(
    "1" -> one,
    // SI base
    "m" -> UnitVal(1, 0, Dims(m = 1)),
    "g" -> UnitVal(1, -3, Dims(kg = 1)),
    "s" -> UnitVal(1, 0, Dims(s = 1)),
    "A" -> UnitVal(1, 0, Dims(a = 1)),
    "K" -> UnitVal(1, 0, Dims(k = 1)),
    "mol" -> UnitVal(1, 0, Dims(mol = 1)),
    "cd" -> UnitVal(1, 0, Dims(cd = 1)),
    // derived, decimal-exact
    "Hz" -> UnitVal(1, 0, Dims(s = -1)),
    "N" -> UnitVal(1, 0, Dims(kg = 1, m = 1, s = -2)),
    "Pa" -> UnitVal(1, 0, Dims(kg = 1, m = -1, s = -2)),
    "J" -> UnitVal(1, 0, Dims(kg = 1, m = 2, s = -2)),
    "W" -> UnitVal(1, 0, Dims(kg = 1, m = 2, s = -3)),
    "C" -> UnitVal(1, 0, Dims(a = 1, s = 1)),
    "V" -> UnitVal(1, 0, Dims(kg = 1, m = 2, s = -3, a = -1)),
    "F" -> UnitVal(1, 0, Dims(kg = -1, m = -2, s = 4, a = 2)),
    "ohm" -> UnitVal(1, 0, Dims(kg = 1, m = 2, s = -3, a = -2)),
    "S" -> UnitVal(1, 0, Dims(kg = -1, m = -2, s = 3, a = 2)),
    "T" -> UnitVal(1, 0, Dims(kg = 1, s = -2, a = -1)),
    "Wb" -> UnitVal(1, 0, Dims(kg = 1, m = 2, s = -2, a = -1)),
    "H" -> UnitVal(1, 0, Dims(kg = 1, m = 2, s = -2, a = -2)),
    // CGS / auxiliary, decimal-exact vs SI
    "erg" -> UnitVal(1, -7, Dims(kg = 1, m = 2, s = -2)),
    "dyn" -> UnitVal(1, -5, Dims(kg = 1, m = 1, s = -2)),
    "bar" -> UnitVal(1, 5, Dims(kg = 1, m = -1, s = -2)),
    "G" -> UnitVal(1, -4, Dims(kg = 1, s = -2, a = -1)), // gauss
    "L" -> UnitVal(1, -3, Dims(m = 3)),
    "t" -> UnitVal(1, 3, Dims(kg = 1)), // tonne
    // non-decimal
    "min" -> UnitVal(60, 0, Dims(s = 1)),
    "hr" -> UnitVal(3600, 0, Dims(s = 1)),
    "day" -> UnitVal(86400, 0, Dims(s = 1)),
    "eV" -> UnitVal(1.602176634, -19, Dims(kg = 1, m = 2, s = -2)),
    "deg" -> UnitVal(math.Pi / 180.0, 0, Dims()),
    "rad" -> one,
    "sr" -> one)

  // SI prefixes as pow10 offsets; two-char prefixes checked before
  // one-char so "da" (deka) never mis-splits as d + a(mpere).
  private val prefixes: Seq[(String, Int)] = Seq(
    "da" -> 1,
    "Y" -> 24, "Z" -> 21, "E" -> 18, "P" -> 15, "T" -> 12, "G" -> 9,
    "M" -> 6, "k" -> 3, "h" -> 2, "d" -> -1, "c" -> -2, "m" -> -3,
    "u" -> -6, "µ" -> -6, "n" -> -9, "p" -> -12, "f" -> -15, "a" -> -18,
    "z" -> -21, "y" -> -24)

  private def resolveName(name: String): UnitVal =
    table.getOrElse(name, {
      val split = prefixes.collectFirst {
        case (p, e) if name.startsWith(p) && table.contains(name.stripPrefix(p)) =>
          val u = table(name.stripPrefix(p))
          u.copy(pow10 = u.pow10 + e)
      }
      split.getOrElse(
        throw new IllegalArgumentException(s"unknown unit '$name'"))
    })

  private val factorRe = """([\p{L}0-9]+)(?:\^(-?\d+))?""".r

  /** Split a unit expression into (isDenominator, factor-text) tokens —
    * the ONE tokenizer both the algebra ([[parse]]) and the renderer
    * ([[Latex.unitsLatex]]) consume, so they cannot drift on what counts
    * as well-formed. Throws on empty factors (`kg//m`) and empty input.
    */
  private[api] def tokenize(expr: String): Seq[(Boolean, String)] = {
    val text = expr.replaceAll("\\s+", "")
    require(text.nonEmpty, "empty unit expression")
    val parts = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    var start = 0
    var divide = false
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text(i) == '*' || text(i) == '/') {
        require(i > start, s"malformed unit expression '$expr'")
        parts += ((divide, text.substring(start, i)))
        if (i < text.length) divide = text(i) == '/'
        start = i + 1
      }
      i += 1
    }
    parts.toSeq
  }

  /** Parse a unit expression to its reduced value. Throws
    * IllegalArgumentException on an unknown unit or malformed syntax.
    */
  def parse(expr: String): UnitVal =
    tokenize(expr).foldLeft(one) { case (acc, (div, tok)) =>
      val u = tok match {
        case factorRe(name, null) => resolveName(name)
        case factorRe(name, e) => resolveName(name).pow(e.toInt)
        case _ => throw new IllegalArgumentException(
          s"malformed unit factor '$tok' in '$expr'")
      }
      if (div) acc / u else acc * u
    }

  /** Exactly-rounded decimal power of ten (both signs) — the same double a
    * SQL engine parses from the literal `1e<p>`, which is what keeps
    * decimal conversions hash-identical across engines.
    */
  def pow10(p: Int): Double =
    new java.math.BigDecimal(java.math.BigInteger.ONE, -p).doubleValue()

  /** Multiplicative conversion factor from `from` to `to`. Throws if the
    * dimensions differ (`kg/m^3 → s` is not a conversion). For
    * purely-decimal pairs the result is the correctly-rounded decimal
    * double.
    */
  def factor(from: String, to: String): Double = {
    val f = parse(from)
    val t = parse(to)
    require(f.dims == t.dims,
      s"incompatible units: '$from' is ${f.dims}, '$to' is ${t.dims}")
    val mRatio = f.mantissa / t.mantissa
    val p = f.pow10 - t.pow10
    if (mRatio == 1.0) pow10(p) else mRatio * pow10(p)
  }

  /** True iff the two unit expressions have the same dimension vector. */
  def compatible(from: String, to: String): Boolean =
    parse(from).dims == parse(to).dims

  /** Column-level conversion — the distributed counterpart of
    * `GridFields.convert` for frames that never pass through the
    * registry: multiplies by the [[factor]] as a folded literal, so the
    * conversion stays a codegen'd scalar multiply inside the scan's
    * projection (no UDF, no shuffle impact). Dimension checking happens
    * at plan-build time on the driver, exactly once.
    */
  def convertColumn(c: org.apache.spark.sql.Column,
      from: String, to: String): org.apache.spark.sql.Column =
    c * org.apache.spark.sql.functions.lit(factor(from, to))
}
