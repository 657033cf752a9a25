package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.queries.Profiling

/** Ingest-time distribution-drift monitoring — the streaming half of
  * p18: an unbounded document stream is binned with the SAME fixed
  * histogram the batch PSI gate uses (`Profiling.psiBin`), per-bin
  * running counts ride in `mapGroupsWithState` (one state row per bin —
  * O(bins) state, independent of stream volume), and after any
  * micro-batch the live counts score against a static reference
  * snapshot through `Profiling.psiOverCounts`, the exact arithmetic the
  * batch gate certifies. The alarm a long-lived ingest raises when the
  * upstream crawl's length/language mix silently moves — without
  * re-scanning what already landed.
  *
  * Deployment shape at 100 TB/day: the bin shuffle is the only wide
  * edge and carries ≤ |bins| keys; the reference histogram is a 20-row
  * broadcast; scoring is driver-tier arithmetic each trigger. Update
  * mode: every micro-batch re-emits each TOUCHED bin's running count;
  * the latest row per bin is the live histogram (untouched bins keep
  * their previous emission — consumers fold with last-per-bin, as
  * [[DriftStream.psiAgainst]] does).
  */
object DriftStream {

  /** Live per-bin state: the bin and its running document count. */
  final case class BinCount(bin: Long, n: Long)

  /** Stateful per-bin running counts over a stream of bin ids (callers
    * bin with `Profiling.psiBin` so stream and batch histogram
    * identically). One state row per bin, NoTimeout — a drift monitor's
    * bins are a fixed small domain, never evicted.
    */
  def binCounts(bins: Dataset[Long]): Dataset[BinCount] = {
    import bins.sparkSession.implicits._
    bins.groupByKey(identity)
      .mapGroupsWithState[BinCount, BinCount](GroupStateTimeout.NoTimeout) {
        (bin, batch, state) =>
          val n = state.getOption.map(_.n).getOrElse(0L) + batch.size
          val next = BinCount(bin, n)
          state.update(next)
          next
      }
  }

  /** [[binCounts]] on Spark 4's `transformWithState` — the
    * current-generation arbitrary-state API (SPARK-46815) that
    * supersedes `mapGroupsWithState`: named typed state primitives from
    * a handle (here ONE `ValueState[Long]` per bin) instead of a single
    * opaque GroupState value, with timers and per-state TTL available
    * when a production deployment wants bounded-lifetime drift windows.
    * Requires the RocksDB state store provider. StreamingSpec pins the
    * two formulations emission-identical on the same micro-batches, so
    * either can back the monitor.
    */
  final class BinCountProcessor
      extends StatefulProcessor[Long, Long, BinCount] {
    @transient private var count: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("n", Encoders.scalaLong,
        TTLConfig.NONE)
    override def handleInputRows(bin: Long, rows: Iterator[Long],
        timers: TimerValues): Iterator[BinCount] = {
      val n = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(n)
      Iterator.single(BinCount(bin, n))
    }
  }

  def binCountsTws(bins: Dataset[Long]): Dataset[BinCount] = {
    import bins.sparkSession.implicits._
    bins.groupByKey(identity)
      .transformWithState(new BinCountProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Score the streamed counts against a static reference histogram
    * (bin, n_ref): fold the accumulated update-mode output (bin, n) to
    * its latest row per bin — counts are monotone non-decreasing, so
    * the latest IS the max — spine to the full fixed bin domain (absent
    * bins count 0: an emptied bin IS drift), and run the
    * batch-certified PSI arithmetic.
    */
  def psiAgainst(latest: DataFrame, reference: DataFrame): DataFrame = {
    val last = latest
      .groupBy("bin").agg(max(col("n")).as("n_cur"))
    Profiling.psiOverCounts(Profiling.spineCounts(
      latest.sparkSession, Seq(reference, last)))
  }
}
