package graft.interp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.RegularGrid

/** Build [[RegularGrid]]s from a long-form grid DataFrame
  * `(time, lon, lat, h, var…)` — the Spark shape of the reference's
  * `KamodoDask.__init__` + `initialize_interpolators`
  * (`kamodo_dask/kamodo_dask.py:301-338`, SURVEY §3 E2).
  *
  *   - axis extraction (R3): 4 tiny distinct-sort aggregates instead of
  *     pandas MultiIndex levels (`kamodo_dask.py:308-317`); a timestamp
  *     `time` column is cast to double = float seconds since epoch, the
  *     reference's interpolation space (`kamodo_dask.py:309`);
  *   - dense pivot (R2): one `orderBy(axes).collect()` of the value columns
  *     replaces `values.reshape(...)` (`kamodo_dask.py:325-334`) — C-order
  *     by construction, independent of source row/partition order (the
  *     invariant the reference's positional logic lacks, SURVEY §7.4);
  *   - NaN → fillValue at grid construction (`fillna`, `kamodo_dask.py:334`).
  *
  * Driver-mode by design: the collect bounds this tier to grids that fit
  * one machine — the reference's own operating envelope. Larger grids use
  * [[BroadcastInterpolator]] (≤ a few GB) or [[JoinInterpolator]] (100 TB).
  */
object GridBuilder {

  val DefaultAxes: Seq[String] = Seq("time", "lon", "lat", "h")

  /** Sorted distinct values of one axis column (cast to double). */
  def axis(df: DataFrame, column: String): Array[Double] =
    df.select(col(column).cast("double").as(column)).distinct()
      .orderBy(column).collect().map(_.getDouble(0))

  /** Build one grid per value column. All value columns share the axes, so
    * the frame is sorted and collected once.
    */
  def fromLongForm(df: DataFrame, valueCols: Seq[String],
      axisCols: Seq[String] = DefaultAxes, fillValue: Double = 0.0)
      : Map[String, RegularGrid] = {
    // persist: axis extraction runs one distinct-job per axis plus the
    // dense collect below — five scans of an uncached multi-file window
    // otherwise (the reference persists before its equivalent step too)
    val cached = df.persist()
    val axes = axisCols.map(a => axis(cached, a)).toArray
    val expected = axes.map(_.length.toLong).product
    val axisExprs = axisCols.map(a => col(a).cast("double").as(a))
    // value columns are backtick-quoted: name[units] names may contain
    // dots (e.g. kg.m-3) that col() would otherwise parse as field access
    val rows = cached
      .select(axisExprs ++ valueCols.map(v => col(s"`$v`").cast("double")): _*)
      .orderBy(axisCols.map(col): _*)
      .collect()
    require(rows.length == expected,
      s"grid is not dense: ${rows.length} rows != ${axes.map(_.length).mkString("×")} = $expected " +
        "(every axis combination must appear exactly once)")
    val d = axisCols.length
    // exact density check: in sorted order, row i's axis tuple must equal
    // the i-th cartesian tuple — a count-only check would accept a
    // duplicated combination masking a missing one and silently misalign
    // every cell after the defect
    locally {
      val idx = new Array[Int](d)
      var i = 0
      while (i < rows.length) {
        var k = 0
        while (k < d) {
          require(rows(i).getDouble(k) == axes(k)(idx(k)),
            s"grid is not dense at sorted row $i: axis ${axisCols(k)} has " +
              s"${rows(i).getDouble(k)}, expected ${axes(k)(idx(k))} " +
              "(duplicate or missing axis combination)")
          k += 1
        }
        // advance mixed-radix counter
        var c = d - 1
        while (c >= 0) {
          idx(c) += 1
          if (idx(c) < axes(c).length) c = -1
          else { idx(c) = 0; c -= 1 }
        }
        i += 1
      }
    }
    cached.unpersist()
    valueCols.zipWithIndex.map { case (v, vi) =>
      val values = new Array[Double](rows.length)
      var i = 0
      while (i < rows.length) {
        values(i) = if (rows(i).isNullAt(d + vi)) Double.NaN else rows(i).getDouble(d + vi)
        i += 1
      }
      v -> new RegularGrid(axes, values, fillValue)
    }.toMap
  }
}
