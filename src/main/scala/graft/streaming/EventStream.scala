package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful event-stream processing — custom per-key state via
  * `mapGroupsWithState` (SURVEY §2.10's partition-function slot, streaming
  * flavor). State per user is O(1) (running aggregates, not buffered
  * events), so a 1000-executor deployment holds state proportional to
  * |users|, not |events|.
  */
object EventStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserState(n_events: Long, total_value: Double, last_ts: Long)

  final case class UserSnapshot(user_id: Long, n_events: Long,
      total_value: Double, last_ts: Long)

  /** Running per-user totals. With `ProcessingTimeTimeout`, state for a
    * user idle longer than `idleTimeoutMs` is evicted (final snapshot
    * emitted) — bounding the state store to active users.
    */
  def runningUserTotals(events: Dataset[Event],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      idleTimeoutMs: Long = 3600000L)
      : Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    val useTimeout = timeout != GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserSnapshot](timeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            // idle eviction: emit the final snapshot and drop the state
            val last = state.get
            state.remove()
            UserSnapshot(userId, last.n_events, last.total_value, last.last_ts)
          } else {
            val prev = state.getOption.getOrElse(UserState(0L, 0.0, Long.MinValue))
            val next = batch.foldLeft(prev) { (s, e) =>
              UserState(s.n_events + 1, s.total_value + e.value,
                math.max(s.last_ts, e.ts.getTime))
            }
            state.update(next)
            if (useTimeout) state.setTimeoutDuration(idleTimeoutMs)
            UserSnapshot(userId, next.n_events, next.total_value, next.last_ts)
          }
      }
  }

  /** Streaming exact dedup: drop re-deliveries of the same `event_id`
    * within the watermark horizon — state is bounded by (events/horizon),
    * the standard at-least-once → effectively-once repair for 100 TB/day
    * ingest. (Batch dedup lives in queries/Dedup; this is its streaming
    * face.)
    */
  def dedupedEvents(events: Dataset[Event]): Dataset[Event] =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked sliding-window event rates by type — the standard
    * dashboard aggregation; append-mode emits closed windows only.
    */
  def eventRates(spark: SparkSession, events: Dataset[Event]) = {
    import spark.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window($"ts", "10 minutes", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), avg($"value").as("avg_value"))
      .select($"window.start".as("win_start"), $"event_type", $"n", $"avg_value")
  }
}
