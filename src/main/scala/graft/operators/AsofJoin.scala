package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row (by
  * `timeCol`) with the same key — the temporal-join primitive the
  * reference's snap-to-grid lookup is a 1-point special case of
  * (`kamodo_dask/kamodo_dask.py:194-206`, SURVEY §2.6).
  *
  * Implementation is the union-and-carry formulation, not a per-key
  * collect or a range join:
  *
  *   1. tag and union both sides (one shuffle on the key),
  *   2. sort within (key) by (time, side) and carry the last seen right
  *      payload forward with `last(_, ignoreNulls=true)` over an
  *      unbounded-preceding window,
  *   3. keep left rows.
  *
  * Cost: one shuffle + one window sort — O(n log n) per key group,
  * no quadratic pair expansion, no skew beyond what the key itself has.
  * This is the formulation that survives 100 TB (a broadcast range-join
  * alternative needs the right side small; this needs nothing).
  */
object AsofJoin {

  /** @param left      probe side
    * @param right     reference side (its latest row at-or-before each left
    *                  row's time is attached)
    * @param key       equi-join key column name (present on both sides)
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param payload   right-side columns to carry (renamed as given)
    * @param tolerance max staleness: a carried row older than this (left
    *                  time − right time, strictly greater) is masked to
    *                  null, exactly like an absent match — the
    *                  merge_asof-style bound that keeps a feature-pipeline
    *                  lookup from serving arbitrarily stale state. None =
    *                  unbounded (classic as-of). The comparison runs on
    *                  integer microseconds (never float seconds — see the
    *                  repo's ts-precision rule).
    * @return left rows + carried payload columns (null when no right row
    *         precedes the left row, or none within tolerance)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Map[String, String],
      tolerance: Option[java.time.Duration] = None): DataFrame = {

    val leftCols = left.columns
    val internal = Seq("_t", "_side", "_p")
    require(!(left.columns ++ right.columns).exists(internal.contains),
      s"inputs must not contain reserved columns ${internal.mkString(",")}")
    require(!payload.values.exists(_ == "_rt"),
      "payload destination _rt is reserved for the carried right time")
    tolerance.foreach(d => require(!d.isNegative, "tolerance must be >= 0"))
    // the time columns are cast to timestamp for the NTZ/LTZ mix; on an
    // INTEGRAL column that cast silently reinterprets the value as
    // SECONDS since epoch (an integer-µs column overflows into garbage
    // ordering) — reject loudly, callers convert via timestamp_micros
    Seq(left.schema(leftTime), right.schema(rightTime)).foreach { f =>
      require(!f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"time column ${f.name} is numeric (${f.dataType.simpleString}): " +
          "cast-to-timestamp would reinterpret it as seconds — pass a " +
          "temporal column (e.g. timestamp_micros for integer µs)")
    }

    // The whole right payload rides in ONE struct per row: carrying each
    // payload column independently with last(ignoreNulls) would tear rows —
    // a null payload VALUE in the newest right row must win over an older
    // non-null one, and per-column carry would skip it. When a tolerance
    // is set, the right time rides in the same struct (field _rt) so the
    // mask sees the time of the row whose payload was carried — and ONLY
    // then: the no-tolerance path keeps its original struct, paying
    // nothing extra through the union shuffle and window sort. _rt leads
    // the struct, but ordering is unchanged: within equal
    // (key, _t, _side=0), _rt == _t, so ties still break on the payload
    // fields.
    val payloadFields = payload.map { case (src, dst) => col(src).as(dst) }
      .toSeq
    val structFields =
      if (tolerance.isDefined)
        col(rightTime).cast("timestamp").as("_rt") +: payloadFields
      else payloadFields
    val taggedRight = right.select(
      col(key).as(key),
      col(rightTime).cast("timestamp").as("_t"),
      lit(0).as("_side"),
      struct(structFields: _*).as("_p"))
    val taggedLeft = left.select(
      Seq(col(key), col(leftTime).cast("timestamp").as("_t"),
        lit(1).as("_side"),
        lit(null).cast(taggedRight.schema("_p").dataType).as("_p")) ++
        leftCols.filterNot(_ == key).map(c => col(c).as(s"_l_$c")): _*)

    val unioned = taggedRight
      .select(taggedLeft.columns.map(c =>
        if (taggedRight.columns.contains(c)) col(c)
        else lit(null).as(c)): _*)
      .unionByName(taggedLeft)

    // side ordering: right rows sort before left rows at equal times, so a
    // tie (left.ts == right.ts) sees the right row — "at or before". The
    // trailing _p key makes equal-(key,time) right rows order
    // deterministically (payload fields must be orderable types).
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_side"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_c", last(col("_p"), ignoreNulls = true).over(w))

    // tolerance mask: carried-but-too-old behaves exactly like no match.
    // Bound in integer MICROseconds computed overflow-safely — toNanos
    // throws past ~292 years; a saturated bound is simply unbounded, the
    // same behavior as None.
    val withinTol: Column = tolerance match {
      case None => lit(true)
      case Some(d) =>
        val tolMicros =
          try Math.addExact(Math.multiplyExact(d.getSeconds, 1000000L),
            d.getNano / 1000L)
          catch { case _: ArithmeticException => Long.MaxValue }
        unix_micros(col("_t")) - unix_micros(col("_c").getField("_rt")) <=
          lit(tolMicros)
    }
    carried.filter(col("_side") === 1)
      .select(
        Seq(col(key)) ++
          leftCols.filterNot(_ == key).map(c => col(s"_l_$c").as(c)) ++
          payload.values.map(dst =>
            when(withinTol, col("_c").getField(dst)).as(dst)): _*)
  }
}
