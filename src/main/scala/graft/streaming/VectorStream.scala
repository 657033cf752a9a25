package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming IVF index maintenance — the ingest-time half of the ANN
  * family (batch: s4/s9/s17). A vector stream is assigned to the FIXED
  * coarse-quantizer centroids (the memoized index-build artifact — s9's
  * `trainedCentroids` discipline: the quantizer trains once, then serves)
  * and per-cell occupancy counts are carried across micro-batches as
  * keyed state, so the index the batch queries probe stays current
  * without a rebuild.
  *
  * Scale shape:
  *  - [[assignAgainst]] is STATELESS — the centroid table rides the plan
  *    as a literal (broadcast for free, KBs for any realistic k) and the
  *    argmax folds per row over that array. No stream aggregation, no
  *    state store, append-mode safe: a naive per-vec_id `groupBy` +
  *    `max_by` (the batch spelling) would grow the state store with
  *    every vector ever seen.
  *  - [[cellCounts]] keeps ONE long per cell via `mapGroupsWithState` —
  *    state is O(|cells|), independent of stream volume (the SketchStream
  *    rule), emitting each touched cell's current count every trigger.
  *
  * Numeric parity with the batch assignment is BIT-exact by
  * construction: the score is the k-means objective 2·⟨u,c⟩ − ‖c‖²
  * (correct for non-unit trained centroids), the dot folds
  * `zip_with → aggregate` in index order — the same sequence of IEEE
  * adds as the batch `graft_dot` kernel — and ‖c‖² folds driver-side in
  * the same order; ties break to the smallest cent_id exactly like the
  * batch `max_by(struct(sim, -cent_id))`. StreamingSpec pins streamed
  * assignments == batch `ivfAssign` on the union of the micro-batches,
  * and final cell counts == the batch per-cell GROUP BY.
  */
object VectorStream {

  /** Live occupancy of one IVF cell. */
  final case class CellCount(cent_id: Long, n_vectors: Long)

  /** Assign every row of `vecs` (needs `vec_id`, `unit: array<double>`)
    * to its nearest centroid. Stateless per-row argmax over the literal
    * centroid array — works identically on a static frame and a
    * streaming one (the spec runs both and compares).
    *
    * @param cents (cent_id, centroid vector) — the fixed quantizer;
    *              centroids need NOT be unit-norm (trained k-means means
    *              are not), hence the 2·dot − ‖c‖² scoring.
    */
  def assignAgainst(vecs: DataFrame,
      cents: Seq[(Long, Seq[Double])]): DataFrame = {
    require(cents.nonEmpty, "assignAgainst needs at least one centroid")
    // (cent_id, cent, cnorm): cnorm folds in index order, matching the
    // batch dot(cent, cent) bit for bit
    val centLit = typedlit(cents.map { case (id, c) =>
      (id, c, c.foldLeft(0.0)((a, x) => a + x * x))
    })
    def score(c: Column): Column =
      lit(2.0) * aggregate(
        zip_with(col("unit"), c.getField("_2"), (x, y) => x * y),
        lit(0.0), (a, x) => a + x) - c.getField("_3")
    val best = aggregate(
      centLit,
      struct(lit(Double.NegativeInfinity).as("s"),
        lit(Long.MaxValue).as("id")),
      (b, c) => {
        val sc = score(c)
        val better = sc > b.getField("s") ||
          (sc === b.getField("s") && c.getField("_1") < b.getField("id"))
        when(better,
          struct(sc.as("s"), c.getField("_1").as("id"))).otherwise(b)
      })
    vecs.withColumn("cent_id", best.getField("id"))
  }

  /** Running per-cell occupancy across micro-batches: one long of state
    * per cell, each touched cell re-emits its current total every
    * trigger (update mode; the latest row per cent_id is the live
    * index stat).
    */
  def cellCounts(centIds: Dataset[Long]): Dataset[CellCount] = {
    import centIds.sparkSession.implicits._
    centIds.groupByKey(identity)
      .mapGroupsWithState[Long, CellCount](GroupStateTimeout.NoTimeout) {
        (cid, batch, state) =>
          val n = state.getOption.getOrElse(0L) + batch.size
          state.update(n)
          CellCount(cid, n)
      }
  }
}
