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

  /** Spread the low 10 bits of `c` (precondition: 0 ≤ c ≤ 1023) to
    * stride-3 positions (bit i → bit 3i) — the classic 4-step magic-mask
    * chain for three-way interleave. Still 4 shifts + 4 masks of builtin
    * bitwise ops, fully codegen'd.
    */
  private def spread3(c: Column): Column = {
    val a = c.bitwiseOR(shiftleft(c, 16)).bitwiseAND(lit(0x030000FFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x0300F00FL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x030C30C3L))
    d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x09249249L))
  }

  /** 30-bit Morton key of three 10-bit coordinates — the reference-shaped
    * (time, lon, lat) 3-D layout: x on bit positions ≡0 (mod 3), y on ≡1,
    * z on ≡2. Bijective on [0,1023]³ ↔ [0,2^30), and consecutive key
    * ranges are ~cubic tiles of the coordinate space. The wider 10-bit
    * coordinate budget (vs morton8's 8) exists because 3-D tiles shrink
    * per-dimension at the same file count — finer buckets keep per-file
    * min/max spans tight enough to prune on.
    */
  def morton10x3(x: Column, y: Column, z: Column): Column =
    spread3(x)
      .bitwiseOR(shiftleft(spread3(y), 1))
      .bitwiseOR(shiftleft(spread3(z), 2))

  /** Spread the low 8 bits of `c` (precondition: 0 ≤ c ≤ 255) to
    * stride-4 positions (bit i → bit 4i): nibbles apart, then pairs,
    * then singles — 3 shifts + 3 masks.
    */
  private def spread4(c: Column): Column = {
    val a = c.bitwiseOR(shiftleft(c, 12)).bitwiseAND(lit(0x000F000FL))
    val b = a.bitwiseOR(shiftleft(a, 6)).bitwiseAND(lit(0x03030303L))
    b.bitwiseOR(shiftleft(b, 3)).bitwiseAND(lit(0x11111111L))
  }

  /** 32-bit Morton key of four 8-bit coordinates — the reference's real
    * arity: a (time, lon, lat, h) layout where every file is a ~4-cube
    * tile of the key space. With the per-dimension budget back at 8 bits
    * (morton8's), the three spreads cover the 2/3/4-dim layouts a
    * gridded-plus-events store actually needs; beyond 4 dims the tiles
    * get so shallow per dimension that Z-order stops out-pruning a plain
    * compound sort, so no wider variant is offered.
    */
  def morton8x4(w: Column, x: Column, y: Column, z: Column): Column =
    spread4(w)
      .bitwiseOR(shiftleft(spread4(x), 1))
      .bitwiseOR(shiftleft(spread4(y), 2))
      .bitwiseOR(shiftleft(spread4(z), 3))

  /** DuckDB text of [[morton10x3]]'s spread (bit i → bit 3i, 10-bit
    * input): identical shift/mask chain, decimal mask literals, so a
    * 3-D z-key replays exactly in the oracle.
    */
  def spread3Sql(e: String): String = {
    val a = s"(($e | ($e << 16)) & 50331903)"   // 0x030000FF
    val b = s"(($a | ($a << 8)) & 50393103)"    // 0x0300F00F
    val c = s"(($b | ($b << 4)) & 51130563)"    // 0x030C30C3
    s"(($c | ($c << 2)) & 153391689)"           // 0x09249249
  }

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
