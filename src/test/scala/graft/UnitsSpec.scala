package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{Latex, Units}

/** Unit algebra + LaTeX rendering — the kamodo-core half of the
  * reference's `@kamodofy(units=units)` registration
  * (`kamodo_dask/kamodo_dask.py:339-351`), implemented natively.
  */
class UnitsSpec extends AnyFunSuite {

  test("parse handles the reference's unit vocabulary") {
    assert(Units.parse("kg/m^3").dims == Units.Dims(m = -3, kg = 1))
    assert(Units.parse("m/s").dims == Units.Dims(m = 1, s = -1))
    assert(Units.parse("nT").dims == Units.Dims(kg = 1, s = -2, a = -1))
    assert(Units.parse("nPa").dims == Units.Dims(kg = 1, m = -1, s = -2))
    assert(Units.parse("1/cm^3").dims == Units.Dims(m = -3))
    assert(Units.parse("erg/cm^3").dims ==
      Units.Dims(kg = 1, m = -1, s = -2)) // energy density = pressure
  }

  test("decimal conversions are the exactly-rounded decimal double") {
    // the bits a SQL engine parses from the literal — the property the
    // g7 hash gate relies on
    assert(Units.factor("kg/m^3", "g/cm^3") == 0.001)
    assert(Units.factor("g/cm^3", "kg/m^3") == 1000.0)
    assert(Units.factor("m", "km") == 0.001)
    assert(Units.factor("nT", "T") == 1e-9)
    assert(Units.factor("nT", "G") == 1e-5) // gauss = 1e-4 T
    assert(Units.factor("erg/cm^3", "Pa") == 0.1)
    assert(Units.factor("bar", "Pa") == 100000.0)
    assert(Units.factor("L", "m^3") == 0.001)
    assert(Units.factor("kg", "g") == 1000.0)
  }

  test("identity and round-trip") {
    assert(Units.factor("kg/m^3", "kg/m^3") == 1.0)
    // kg = k-prefix on g must reduce to exactly SI mass
    assert(Units.factor("kg", "kg") == 1.0)
    val f = Units.factor("eV", "J")
    assert(math.abs(f - 1.602176634e-19) / 1.602176634e-19 < 1e-15)
    assert(Units.factor("min", "s") == 60.0)
    assert(Units.factor("hr", "min") == 60.0)
    assert(Units.factor("day", "s") == 86400.0)
  }

  test("derived-unit identities hold dimensionally") {
    // J = N*m = Pa*m^3 = W*s
    val j = Units.parse("J").dims
    assert(Units.parse("N*m").dims == j)
    assert(Units.parse("Pa*m^3").dims == j)
    assert(Units.parse("W*s").dims == j)
    // T = Wb/m^2 = V*s/m^2 = kg/s^2/A (sequential division)
    val t = Units.parse("T").dims
    assert(Units.parse("Wb/m^2").dims == t)
    assert(Units.parse("V*s/m^2").dims == t)
    assert(Units.parse("kg/s^2/A").dims == t)
  }

  test("prefix resolution: exact name beats prefix split; da is two-char") {
    // T is tesla (exact), not tera-<nothing>; min is minutes, not
    // milli-in; dam is deka-metre
    assert(Units.parse("T").dims == Units.Dims(kg = 1, s = -2, a = -1))
    assert(Units.parse("min").dims == Units.Dims(s = 1))
    assert(Units.factor("dam", "m") == 10.0)
    assert(Units.factor("um", "m") == 1e-6)
    assert(Units.factor("µm", "m") == 1e-6)
  }

  test("incompatible dimensions and unknown units throw") {
    intercept[IllegalArgumentException](Units.factor("kg/m^3", "s"))
    intercept[IllegalArgumentException](Units.parse("florps"))
    intercept[IllegalArgumentException](Units.parse("kg//m"))
    intercept[IllegalArgumentException](Units.parse(""))
    assert(!Units.compatible("kg", "m"))
    assert(Units.compatible("erg/cm^3", "nPa"))
  }

  test("latex falls back to verbatim on strings the tokenizer rejects") {
    // VarMeta's bracket regex accepts anything; display must not crash
    // where convert errors loudly — same tokenizer, different severity
    assert(Latex.unitsLatex("kg//m") == "kg//m")
    assert(Latex.unitsLatex("") == "")
    intercept[IllegalArgumentException](Units.parse("kg//m"))
  }

  test("latex: greek names, subscripts, unit fractions (kamodo style)") {
    assert(Latex.symbol("rho") == "\\rho")
    assert(Latex.symbol("rho_ijkl") == "\\rho_{ijkl}")
    assert(Latex.symbol("T_e") == "T_{e}")
    assert(Latex.symbol("foo") == "foo")
    assert(Latex.unitsLatex("kg/m^3") == "\\frac{kg}{m^{3}}")
    assert(Latex.unitsLatex("m/s") == "\\frac{m}{s}")
    assert(Latex.unitsLatex("nT") == "nT")
    assert(Latex.unitsLatex("1/cm^3") == "\\frac{1}{cm^{3}}")
    assert(Latex.unitsLatex("N*m") == "N \\, m")
    assert(Latex.func("rho", Seq("t", "lon", "lat", "h"), "kg/m^3") ==
      "\\rho{\\left(t,lon,lat,h \\right)}[\\frac{kg}{m^{3}}]")
    assert(Latex.func("f", Seq("x"), "") == "f{\\left(x \\right)}")
  }
}
