package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Ingest-time geo-layout maintenance — the streaming half of q71: as
  * points stream in, the per-cell occupancy profile (count + coordinate
  * extrema) rides in `mapGroupsWithState`, one state row per morton
  * cell — O(2¹⁶) state ceiling, independent of stream volume. This is
  * the profile a cell-partitioned geo layout re-balances from (q71's
  * scale contract: the cell is the write key); maintaining it live
  * means the layout job reads a KB-sized state table instead of
  * rescanning the point corpus. Counts and extrema are mergeable
  * monotone statistics, so update-mode's latest row per cell is the
  * live profile (consumers fold last-per-cell, as [[profile]] does —
  * counts via max, extrema idempotent).
  */
object GeoStream {

  /** One streamed point, already quantized to its morton cell by the
    * caller with q71's exact arithmetic (cell, klon, klat).
    */
  final case class CellPoint(cell: Long, klon: Long, klat: Long)

  /** Live per-cell state: q71's occupancy row. */
  final case class CellProfile(cell: Long, nPoints: Long,
      klonMin: Long, klonMax: Long, klatMin: Long, klatMax: Long)

  /** Stateful per-cell occupancy over a stream of quantized points.
    * One state row per cell, NoTimeout — a layout profile's cells are
    * a fixed bounded domain, never evicted.
    */
  def cellProfiles(pts: Dataset[CellPoint]): Dataset[CellProfile] = {
    import pts.sparkSession.implicits._
    pts.groupByKey(_.cell)
      .mapGroupsWithState[CellProfile, CellProfile](
        GroupStateTimeout.NoTimeout) { (cell, batch, state) =>
          val b = batch.toSeq
          val prev = state.getOption.getOrElse(
            CellProfile(cell, 0L, Long.MaxValue, Long.MinValue,
              Long.MaxValue, Long.MinValue))
          val next = CellProfile(cell,
            prev.nPoints + b.size,
            math.min(prev.klonMin, b.map(_.klon).min),
            math.max(prev.klonMax, b.map(_.klon).max),
            math.min(prev.klatMin, b.map(_.klat).min),
            math.max(prev.klatMax, b.map(_.klat).max))
          state.update(next)
          next
        }
  }

  /** Fold accumulated update-mode output to the live profile (latest
    * row per cell = max count; extrema are idempotent under the same
    * fold), renamed to q71's exact output schema for parity checks.
    */
  def profile(latest: DataFrame): DataFrame =
    latest.groupBy("cell")
      .agg(max(col("nPoints")).as("n_points"),
        min(col("klonMin")).as("klon_min"), max(col("klonMax")).as("klon_max"),
        min(col("klatMin")).as("klat_min"), max(col("klatMax")).as("klat_max"))
}
