package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
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
  *  - [[assignAgainst]] is STATELESS — the centroid table rides the
  *    task closure (broadcast for free, KBs for any realistic k) and a
  *    compiled per-row loop argmaxes over that array. No stream
  *    aggregation, no state store, append-mode safe: a naive per-vec_id
  *    `groupBy` + `max_by` (the batch spelling) would grow the state
  *    store with every vector ever seen.
  *  - [[cellCounts]] keeps ONE long per cell via `mapGroupsWithState` —
  *    state is O(|cells|), independent of stream volume (the SketchStream
  *    rule), emitting each touched cell's current count every trigger.
  *
  * Numeric parity with the batch assignment is BIT-exact by
  * construction WHEN the scoring forms match: the dot loop accumulates
  * in ascending index order — the same sequence of IEEE adds as the
  * batch `graft_dot` kernel (and as the pre-r11 `zip_with → aggregate`
  * fold it replaced) — ‖c‖² folds driver-side in the same order, and
  * ties break to the smallest cent_id exactly like the batch
  * `max_by(struct(sim, -cent_id))`. The scoring form is a
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
    * to its nearest centroid. Stateless per-row argmax over the
    * closure-carried centroid array — works identically on a static
    * frame and a streaming one (the spec runs both and compares).
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
    // COMPILED per-partition scorer (round 11): the former Catalyst
    // higher-order fold — `aggregate` over a typedlit of C (id, cent,
    // cnorm) entries with a `zip_with` dot per element — is evaluated
    // INTERPRETED per row (higher-order functions don't codegen), which
    // the organic ×50 stream rehearsal measured at ~37 s per 12.5k-row
    // micro-batch once the index reached C = 1021 cells. This loop is
    // the same argmax over the same ascending-index double folds (dot
    // and cnorm both accumulate in index order — bit-identical to the
    // old fold AND to the batch plan's codegen DotProduct), JIT-compiled.
    // Still STATELESS and narrow: the centroid array rides the closure,
    // no shuffle, no state — which is what lets [[cellCounts]] stay the
    // streaming query's one stateful operator.
    val centArr: Array[(Long, Array[Double], Double)] =
      cents.map { case (id, c) =>
        val a = c.toArray
        (id, a, a.foldLeft(0.0)((acc, x) => acc + x * x))
      }.toArray
    val unitIdx = vecs.schema.fieldIndex("unit")
    val outSchema = vecs.schema
      .add("cent_id", org.apache.spark.sql.types.LongType, nullable = false)
    val obj = kmeansObjective
    vecs.mapPartitions { it =>
      it.map { r =>
        val seq = r.getSeq[Double](unitIdx)
        val u = new Array[Double](seq.length)
        var j = 0
        while (j < u.length) { u(j) = seq(j); j += 1 }
        var bestS = Double.NegativeInfinity
        var bestId = Long.MaxValue
        var i = 0
        while (i < centArr.length) {
          val (id, c, cn) = centArr(i)
          var d = 0.0
          var k = 0
          while (k < u.length) { d += u(k) * c(k); k += 1 }
          val s0 = if (obj) 2.0 * d - cn else d
          // Catalyst's TOTAL double order, not Java `>` (ADVICE r11):
          // Spark SQL ranks NaN above every double and -0.0 == 0.0, so
          // a NaN-scored row must still pick a centroid (the old fold
          // did; bare `>` is false for NaN and would leak
          // bestId = Long.MaxValue — an id that is not a cell).
          // Double.compare gives the NaN ordering; the -0.0 normalize
          // restores Spark's -0.0 == 0.0 tie (compare ranks -0.0 lower).
          val s = if (s0 == 0.0) 0.0 else s0
          val cmp = java.lang.Double.compare(s, bestS)
          if (cmp > 0 || (cmp == 0 && id < bestId)) {
            bestS = s; bestId = id
          }
          i += 1
        }
        Row.fromSeq(r.toSeq :+ bestId)
      }
    }(Encoders.row(outSchema))
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
