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
  * construction WHEN the scoring forms match: the dot folds
  * `zip_with → aggregate` in index order — the same sequence of IEEE
  * adds as the batch `graft_dot` kernel — ‖c‖² folds driver-side in the
  * same order, and ties break to the smallest cent_id exactly like the
  * batch `max_by(struct(sim, -cent_id))`. The scoring form is a
  * parameter because plain-dot (s4's unit-centroid ranking) and the
  * k-means objective (s9's trained form) agree only in exact
  * arithmetic, not bit-for-bit — see [[assignAgainst]]. StreamingSpec
  * pins streamed assignments == batch `ivfAssign` on the union of the
  * micro-batches (plain-dot form), the two forms' agreement on the
  * fixture, and final cell counts == the batch per-cell GROUP BY.
  */
object VectorStream {

  /** Live occupancy of one IVF cell. */
  final case class CellCount(cent_id: Long, n_vectors: Long)

  /** Assign every row of `vecs` (needs `vec_id`, `unit: array<double>`)
    * to its nearest centroid. Stateless per-row argmax over the literal
    * centroid array — works identically on a static frame and a
    * streaming one (the spec runs both and compares).
    *
    * @param cents (cent_id, centroid vector) — the fixed quantizer.
    * @param kmeansObjective scoring form. `true` (default): the k-means
    *              objective 2·dot − ‖c‖² — REQUIRED for trained non-unit
    *              centroids (s9's form). `false`: plain dot — the exact
    *              ranking batch `ivfAssign`/s4 uses for its unit-norm
    *              centroids. The two orders agree in exact arithmetic
    *              for unit centroids, but NOT bit-for-bit: computed
    *              ‖c‖² values differ from 1.0 by per-centroid ulps, so
    *              near-tied dots could argmax differently. A caller
    *              pinning parity against a plain-dot batch assignment
    *              must pass false; defaulting to the objective keeps
    *              the trained path correct.
    */
  def assignAgainst(vecs: DataFrame,
      cents: Seq[(Long, Seq[Double])],
      kmeansObjective: Boolean = true): DataFrame = {
    require(cents.nonEmpty, "assignAgainst needs at least one centroid")
    // (cent_id, cent, cnorm): cnorm folds in index order, matching the
    // batch dot(cent, cent) bit for bit
    val centLit = typedlit(cents.map { case (id, c) =>
      (id, c, c.foldLeft(0.0)((a, x) => a + x * x))
    })
    def dotc(c: Column): Column =
      aggregate(
        zip_with(col("unit"), c.getField("_2"), (x, y) => x * y),
        lit(0.0), (a, x) => a + x)
    def score(c: Column): Column =
      if (kmeansObjective) lit(2.0) * dotc(c) - c.getField("_3")
      else dotc(c)
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
