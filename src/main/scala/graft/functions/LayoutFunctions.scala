package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional file clustering.
  *
  * At 100 TB the scan cost of a 2-D box predicate (a time range × a value
  * band) is decided by the FILE LAYOUT, not the query plan: parquet
  * min/max stats prune a file only when the file is tight in the filtered
  * dimension. A layout sorted by one dimension is tight in that dimension
  * and spans the full range of every other; a Z-order (Morton) layout
  * interleaves the dimensions' bits so every file is a near-square tile
  * of the key space — tight in ALL dimensions at once (the Delta/Iceberg
  * `OPTIMIZE ZORDER BY` idea, re-expressed as a plain sort key).
  *
  * The interleave is the classic magic-number bit spread — 6 shifts and 6
  * masks of builtin bitwise ops, fully codegen'd, no UDF; writing the
  * z-clustered layout is then `df.repartitionByRange(col("z"))
  * .sortWithinPartitions("z").write...` — an ordinary range shuffle.
  */
object LayoutFunctions {

  /** Spread the low 8 bits of `c` (precondition: 0 ≤ c ≤ 255) into the
    * even bit positions of a 16-bit word: bit i → bit 2i.
    */
  private def spread8(c: Column): Column = {
    val a = c.bitwiseOR(shiftleft(c, 4)).bitwiseAND(lit(0x0F0FL))
    val b = a.bitwiseOR(shiftleft(a, 2)).bitwiseAND(lit(0x3333L))
    b.bitwiseOR(shiftleft(b, 1)).bitwiseAND(lit(0x5555L))
  }

  /** 16-bit Morton key of two 8-bit coordinates: `x`'s bits land on even
    * positions, `y`'s on odd. Bijective on [0,255]² ↔ [0,65535], and
    * consecutive key ranges are ~square tiles of the (x, y) plane.
    */
  def morton8(x: Column, y: Column): Column =
    spread8(x).bitwiseOR(shiftleft(spread8(y), 1))

  /** SQL text of a TOTAL day bucket in [0,255] from a µs-epoch
    * expression: floor-div to the UTC day, then positive wrap. Truncating
    * `DIV` alone goes negative before the epoch and hands [[morton8]]'s
    * bit spread a value outside its 0..255 precondition (the mask chain
    * would alias unrelated tiles); the pmod-subtraction floor-div stays
    * integer-exact at any epoch distance (a double-division floor loses
    * exactness past 2^53 µs, year ~2255) and matches the oracle's
    * floor-semantics `//` for pre-1970 inputs, so both engines bucket
    * old data identically.
    */
  def dayBucket256Sql(usExpr: String): String =
    s"pmod((($usExpr) - pmod($usExpr, 86400000000)) DIV 86400000000, 256)"
}
