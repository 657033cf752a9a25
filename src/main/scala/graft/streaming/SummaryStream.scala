package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Checkpoints
import graft.plans.SummaryRewrite

/** Streaming materialized-summary maintenance — the ingest twin of the
  * q68/q69 pair, and the engine's take on "live tables" incremental-view
  * maintenance: as base rows stream in, the [[SummaryRewrite]] summary
  * (count + per-measure sum/non-null-count/min/max states) is kept
  * current by folding each micro-batch's delta summary into the
  * maintained state with [[SummaryRewrite.mergeSummaries]] — q50's
  * algebra per trigger. The state is O(|key combinations|), independent
  * of stream volume; per-batch cost is one delta-sized aggregate plus a
  * KB-sized merge. A summary maintained here can be written out and
  * registered for [[SummaryRewrite]], so naive aggregates over the base
  * table are served from an always-current summary with no rebuild job
  * anywhere in the loop (StreamingSpec pins exactly that composition).
  *
  * Delivery contract: counts and sums are NOT idempotent under row
  * re-delivery, so — unlike ClusterStream's union-find, which absorbs
  * duplicates for free — this sink must be transactional per batch. It
  * implements the standard idempotent-foreachBatch discipline: the last
  * applied batchId is tracked and a re-delivered batch (same or older
  * id, the restart-replay case) is a no-op. At-least-once delivery of
  * DISTINCT batch ids with overlapping content is the upstream source's
  * contract to prevent, exactly as for any exactly-once aggregate sink.
  *
  * State frames follow the [[Checkpoints]] free-previous discipline
  * (each merged summary ends in an eager localCheckpoint; the previous
  * batch's blocks are freed once the new state materializes), so state
  * stays one frame deep at any stream length.
  */
object SummaryStream {

  /** The maintained summary state for `keys` × `measures`. Not
    * thread-safe — drive it from one streaming query (foreachBatch runs
    * batches serially) or one test loop; call [[close]] when done.
    */
  final class SummaryState(keys: Seq[String], measures: Seq[String]) {
    private var cur: Option[DataFrame] = None
    private var lastBatch: Long = -1L

    /** The current summary (None before the first batch). Valid until
      * the next [[ingest]] frees its blocks.
      */
    def snapshot: Option[DataFrame] = cur

    /** Fold one micro-batch of BASE ROWS into the summary. Re-delivered
      * batch ids (id <= last applied) are ignored — the idempotence
      * contract above. `lastBatch` advances only AFTER the fold
      * materializes: a mid-fold failure (transient Spark error) leaves the
      * guard untouched, so the engine's retry of the SAME batchId is
      * re-applied rather than silently skipped — a failed attempt is not
      * a committed one.
      */
    def ingest(batch: DataFrame, batchId: Long): Unit = {
      if (batchId <= lastBatch) return
      val delta = SummaryRewrite.buildSummary(batch, keys, measures)
      val next = (cur match {
        case None => delta
        case Some(m) => SummaryRewrite.mergeSummaries(m, delta, keys, measures)
      }).localCheckpoint()
      cur.foreach(Checkpoints.free)
      cur = Some(next)
      lastBatch = batchId
    }

    /** Free the state's checkpoint blocks. */
    def close(): Unit = { cur.foreach(Checkpoints.free); cur = None }
  }

  /** Wire a streaming frame of base rows into `state`. foreachBatch:
    * the merge is a cross-key aggregate over the whole delta, not a
    * keyed state op, and batches must fold serially.
    */
  def maintain(rows: DataFrame, state: SummaryState): StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) => state.ingest(batch, id) }
      .outputMode("append")
      .start()
}
