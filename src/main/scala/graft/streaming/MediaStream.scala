package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.multimodal.Multimodal.FrameEnergy

/** Streaming VAD — the stateful twin of batch mm8: per-item speech
  * segmentation carried ACROSS micro-batches in O(1) state (the open
  * run's length plus the profile counters — never buffered frames). The
  * live form of the audio-ingest use case: frames stream out of the
  * decoder as an item downloads, and the segment profile must update
  * without waiting for the whole item.
  *
  * Same decision (Σb² ≥ 10000·n, the exact integer compare) and same
  * maximal-run semantics as mm8. Precondition: per-item in-order frame
  * delivery across micro-batches (the EWMA/sessionize ordered-delivery
  * contract); the in-batch iterator is sorted by frame_idx, and a gap
  * or re-delivery fails LOUDLY by index (state carries the expected
  * next index) instead of silently splitting a run. Update mode: each
  * snapshot is the item's current profile; the final snapshot equals
  * mm8's row exactly (StreamingSpec pins all four counters).
  */
object MediaStream {

  /** O(1) per-item state: next expected frame index, the four profile
    * counters, and the length of the currently-open speech run.
    */
  final case class VadState(nextIdx: Int, nFrames: Long, nSpeech: Long,
      nSegments: Long, maxSeg: Long, openRun: Long)

  final case class VadSnapshot(media_id: Long, n_frames: Long,
      n_speech_frames: Long, n_segments: Long, max_seg_frames: Long)

  def vadProfile(frames: Dataset[FrameEnergy]): Dataset[VadSnapshot] = {
    import frames.sparkSession.implicits._
    frames.groupByKey(_.media_id)
      .mapGroupsWithState[VadState, VadSnapshot](
          GroupStateTimeout.NoTimeout) {
        (id: Long, batch: Iterator[FrameEnergy],
            state: GroupState[VadState]) =>
          val fs = batch.toArray.sortBy(_.frame_idx)
          var s = state.getOption.getOrElse(VadState(0, 0L, 0L, 0L, 0L, 0L))
          fs.foreach { f =>
            require(f.frame_idx == s.nextIdx,
              s"out-of-order frame ${f.frame_idx} for media $id " +
                s"(expected ${s.nextIdx}) — VAD runs need ordered delivery")
            val speech = f.sum_sq >= 10000L * f.n_bytes
            s = if (speech) {
              val run = s.openRun + 1
              VadState(s.nextIdx + 1, s.nFrames + 1, s.nSpeech + 1,
                if (run == 1L) s.nSegments + 1 else s.nSegments,
                math.max(s.maxSeg, run), run)
            } else {
              VadState(s.nextIdx + 1, s.nFrames + 1, s.nSpeech,
                s.nSegments, s.maxSeg, 0L)
            }
          }
          state.update(s)
          VadSnapshot(id, s.nFrames, s.nSpeech, s.nSegments, s.maxSeg)
      }
  }
}
