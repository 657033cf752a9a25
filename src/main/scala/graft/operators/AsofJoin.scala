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
    * @return left rows + carried payload columns (null when no right row
    *         precedes the left row)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Map[String, String]): DataFrame = {

    val leftCols = left.columns
    val internal = Seq("_t", "_side", "_p")
    require(!(left.columns ++ right.columns).exists(internal.contains),
      s"inputs must not contain reserved columns ${internal.mkString(",")}")

    // The whole right payload rides in ONE struct per row: carrying each
    // payload column independently with last(ignoreNulls) would tear rows —
    // a null payload VALUE in the newest right row must win over an older
    // non-null one, and per-column carry would skip it.
    val taggedRight = right.select(
      col(key).as(key),
      col(rightTime).cast("timestamp").as("_t"),
      lit(0).as("_side"),
      struct(payload.map { case (src, dst) => col(src).as(dst) }.toSeq: _*)
        .as("_p"))
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

    carried.filter(col("_side") === 1)
      .select(
        Seq(col(key)) ++
          leftCols.filterNot(_ == key).map(c => col(s"_l_$c").as(c)) ++
          payload.values.map(dst => col("_c").getField(dst).as(dst)): _*)
  }
}
