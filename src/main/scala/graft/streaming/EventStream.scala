package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** Per-user sessionizer state: O(1) — (1-based session index, session
    * start µs, last event µs, event count). Never buffers events.
    * `n == 0` is the IDLE tombstone: no open session, but the index of
    * the last closed one is retained — a timeout that simply removed the
    * state would restart session numbering at the user's next event and
    * silently diverge from the batch form's per-user running count.
    */
  final case class SessionState(sessionIdx: Long, startUs: Long,
      lastUs: Long, n: Long)

  final case class Session(user_id: Long, session_id: Long, n_events: Long,
      session_start_us: Long)

  private def usOf(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Streaming sessionizer — the stateful twin of the batch q19 window
    * form (lag gap-flag + running count over one user_id shuffle): a gap
    * of more than `gapSec` between consecutive events starts a new
    * session. Sessions CLOSE in-stream when the closing gap is observed;
    * still-open sessions flush when the event-time watermark passes
    * `last event + gapSec` (EventTimeTimeout), so emitted rows are final
    * (Append mode) and the state store holds one O(1) record per user —
    * never |events|, the property that lets 100 TB/day of events
    * sessionize on state proportional to the user population. (The
    * record outlives idleness as a tombstone carrying the session
    * counter — see [[SessionState]]; a deployment that must evict cold
    * users entirely would use the session START time as the session
    * identity instead of a counter, trading q19's id scheme for strict
    * active-users-only state.)
    *
    * Gap arithmetic mirrors q19 exactly: whole-second floors
    * (`unix_timestamp` semantics) compared with `> gapSec`, ties on ts
    * processed in (ts, event_id) order, `session_start_us` = µs of the
    * session's first event. StreamingSpec pins batch == stream on the
    * driver fixture. Assumes per-user event-time-ordered delivery ACROSS
    * micro-batches (the cadence file source's order; re-deliveries are
    * dropped upstream by [[dedupedEvents]]); the in-batch iterator is
    * unordered and sorted here.
    */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800L)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$gapSec seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last event + gap: the open session is final;
            // the state degrades to the idle tombstone (counter kept)
            val s = state.get
            state.update(s.copy(n = 0L))
            Iterator.single(Session(userId, s.sessionIdx, s.n, s.startUs))
          } else {
            val evs = batch.toArray.sortBy(e => (usOf(e.ts), e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            evs.foreach { e =>
              val t = usOf(e.ts)
              cur match {
                case Some(s) if s.n == 0L => // idle tombstone: next index
                  cur = Some(SessionState(s.sessionIdx + 1, t, t, 1L))
                case Some(s)
                    if t / 1000000L - s.lastUs / 1000000L <= gapSec =>
                  cur = Some(s.copy(lastUs = math.max(s.lastUs, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= Session(userId, s.sessionIdx, s.n, s.startUs)
                  cur = Some(SessionState(s.sessionIdx + 1, t, t, 1L))
                case None =>
                  cur = Some(SessionState(1L, t, t, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // flush when the watermark proves no event can extend it
              if (s.n > 0L)
                state.setTimeoutTimestamp(s.lastUs / 1000L + gapSec * 1000L + 1L)
            }
            closed.reverse.iterator
          }
      }
  }

  /** Per-user funnel state: the earliest qualifying timestamp (µs) of
    * each stage, −1 = not reached. Monotone — a field set once never
    * changes — which is what lets the parity test reduce Update-mode
    * snapshots with max().
    */
  final case class FunnelState(t1: Long, t2: Long, t3: Long)

  final case class FunnelSnapshot(user_id: Long, t1_us: Long, t2_us: Long,
      t3_us: Long)

  /** Streaming funnel — the stateful twin of batch q45 (signup → view →
    * purchase, each stage strictly after the previous): O(1) state per
    * user (three µs timestamps, never buffered events), so ingest-time
    * funnel tracking at 100 TB/day holds state proportional to the user
    * population. Stage semantics mirror q45 exactly: a stage-k event
    * qualifies iff stage k−1 is reached, stage k is not, and the event
    * time is strictly greater — processed in per-user event-time order
    * (in-batch sort here; ordered delivery across micro-batches is the
    * same documented precondition as [[sessionize]]), the first
    * qualifying event IS the stage minimum the batch form computes.
    * StreamingSpec pins stream == q45 stage counts on the driver fixture.
    */
  def funnel(events: Dataset[Event]): Dataset[FunnelSnapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelSnapshot](
          GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]) =>
          val evs = batch.toArray.sortBy(e => (usOf(e.ts), e.event_id))
          var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          evs.foreach { e =>
            val t = usOf(e.ts)
            e.event_type match {
              case "signup" if s.t1 < 0L => s = s.copy(t1 = t)
              case "view" if s.t1 >= 0L && s.t2 < 0L && t > s.t1 =>
                s = s.copy(t2 = t)
              case "purchase" if s.t2 >= 0L && s.t3 < 0L && t > s.t2 =>
                s = s.copy(t3 = t)
              case _ => ()
            }
          }
          state.update(s)
          FunnelSnapshot(userId, s.t1, s.t2, s.t3)
      }
  }

  /** Per-user EWMA state: (rows seen, current smoothed value) — O(1). */
  final case class EwmaState(n: Long, ewma: Double)

  final case class EwmaSnapshot(user_id: Long, n: Long, ewma: Double)

  /** Streaming EWMA — the stateful twin of batch q62: per-user
    * exponential smoothing carried ACROSS micro-batches in O(1) state.
    * The recurrence is the literal `0.3·x + 0.7·prev` the batch fold
    * runs (same doubles in the same order given the [[sessionize]]
    * ordered-delivery precondition; the in-batch iterator is sorted by
    * the same (µs, event_id) total order), so the final snapshot per
    * user is BIT-identical to q62's last row — StreamingSpec pins it
    * with strict equality, no tolerance. The live form of the
    * anomaly-baseline use case: each Update-mode snapshot is the
    * current smoothed level a detector thresholds against.
    */
  def ewma(events: Dataset[Event]): Dataset[EwmaSnapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, EwmaSnapshot](
          GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[EwmaState]) =>
          val evs = batch.toArray.sortBy(e => (usOf(e.ts), e.event_id))
          var s = state.getOption.getOrElse(EwmaState(0L, 0.0))
          evs.foreach { e =>
            s = if (s.n == 0L) EwmaState(1L, e.value)
              else EwmaState(s.n + 1L, 0.3 * e.value + 0.7 * s.ewma)
          }
          state.update(s)
          EwmaSnapshot(userId, s.n, s.ewma)
      }
  }

  /** Per-user adjacency state for [[transitions]]: the last event seen —
    * O(1), never buffered events.
    */
  final case class LastEvent(us: Long, eventId: Long, tpe: String)

  final case class Transition(user_id: Long, from_type: String,
      to_type: String, gap_us: Long)

  /** Streaming event-transition emitter — the stateful twin of batch
    * q52's Markov matrix: every adjacent per-user (from, to) step is
    * emitted AS IT HAPPENS with its dwell gap, ready for a downstream
    * windowed `groupBy(from_type, to_type)` (the live journey dashboard).
    * State per user is the last event only, so 100 TB/day holds state ∝
    * users. A transition is final the moment its second endpoint is
    * processed (given per-user ordered delivery across micro-batches —
    * the [[sessionize]] precondition — with re-deliveries dropped by
    * [[dedupedEvents]]), so Append mode is sound with no timeout; the
    * in-batch iterator is sorted by the same (µs, event_id) total order
    * q52 uses, making stream == batch exact (StreamingSpec pins the
    * full matrix, counts AND gap sums).
    */
  def transitions(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, Transition](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[LastEvent]) =>
          val evs = batch.toArray.sortBy(e => (usOf(e.ts), e.event_id))
          var out = List.empty[Transition]
          var last = state.getOption
          evs.foreach { e =>
            val t = usOf(e.ts)
            last.foreach { p =>
              out ::= Transition(userId, p.tpe, e.event_type, t - p.us)
            }
            last = Some(LastEvent(t, e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.reverse.iterator
      }
  }

  final case class LastTouch(us: Long, eventId: Long, tpe: String)

  final case class Attribution(user_id: Long, purchase_us: Long,
      touch_type: String, v_milli: Long)

  /** Streaming last-touch attribution — the stateful twin of batch q59:
    * each purchase is credited AS IT ARRIVES to the user's latest
    * preceding non-purchase touch within `maxStaleUs` (default 1 h),
    * '(none)' otherwise; a downstream windowed
    * `groupBy(touch_type).agg(count, sum(v_milli))` is the live revenue
    * dashboard. State per user is the last touch only — O(1), state ∝
    * users at 100 TB/day. Tie semantics replicate q59 exactly: within
    * one µs, touches collapse to the max event_id (the batch arg_max)
    * and a purchase sees same-µs touches (the ASOF tus <= us rule) —
    * hence the in-batch sort puts touches BEFORE purchases at equal µs.
    * Delivery precondition (stricter than [[sessionize]]'s, because the
    * tie rule is order-sensitive ACROSS batches too): per-user delivery
    * must be ordered by (µs, touches-before-purchases, event_id) — a
    * same-µs touch split into a LATER micro-batch than its purchase
    * would be credited '(none)' where batch q59's ASOF credits the
    * touch. An attribution is final when its purchase is processed, so
    * Append mode is sound with no timeout. StreamingSpec delivers in
    * exactly that order and pins stream == q59's per-type counts and
    * revenue.
    */
  def attribution(events: Dataset[Event],
      maxStaleUs: Long = 3600000000L): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastTouch, Attribution](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[LastTouch]) =>
          val evs = batch.toArray.sortBy { e =>
            (usOf(e.ts), if (e.event_type == "purchase") 1 else 0, e.event_id)
          }
          var out = List.empty[Attribution]
          var last = state.getOption
          evs.foreach { e =>
            val t = usOf(e.ts)
            if (e.event_type == "purchase") {
              val tt = last match {
                case Some(p) if t - p.us <= maxStaleUs => p.tpe
                case _ => "(none)"
              }
              out ::= Attribution(userId, t, tt,
                math.floor(e.value * 1000).toLong)
            } else if (last.forall(p =>
                t > p.us || (t == p.us && e.event_id > p.eventId))) {
              last = Some(LastTouch(t, e.event_id, e.event_type))
            }
          }
          last.foreach(state.update)
          out.reverse.iterator
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

  final case class WindowDistinct(user_id: Long, event_id: Long, us: Long,
      n_types_1h: Long)

  /** Streaming trailing-window distinct-type count — batch q53's
    * stateful twin: every event is annotated, as it arrives, with how
    * many DISTINCT event types its user touched in the trailing hour.
    *
    * State per user is a (type → last-seen µs) map — O(active
    * vocabulary), NOT O(events-in-window): a type is in the trailing
    * window iff its LAST occurrence is (last-seen only moves forward),
    * so per event the map is bumped, stale types evicted, and the map
    * size IS the count. The same state-shape argument as q53's bitmask
    * (constant-ish per user, nothing buffered), lifted to streaming —
    * and it works unchanged for >64-symbol vocabularies, where the
    * batch side graduates to windowDistinctApprox.
    *
    * Tie semantics replicate q53's RANGE frame exactly: peers at the
    * SAME µs count each other in both directions, so each same-µs run
    * is absorbed into the map BEFORE any of its rows is emitted.
    * Delivery precondition (attribution's rule): per-user delivery
    * ordered by (µs, event_id) with same-µs runs within one
    * micro-batch — a run split across batches would under-count the
    * earlier fragment where the batch RANGE frame sees all peers.
    * Emitted rows are final at emission → Append mode, no timeout
    * (production would add an idle-eviction timeout like
    * [[runningUserTotals]]; parity harnesses replay finite fixtures).
    */
  def windowedDistinctTypes(events: Dataset[Event],
      windowUs: Long = 3600000000L): Dataset[WindowDistinct] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Map[String, Long], WindowDistinct](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event],
            state: GroupState[Map[String, Long]]) =>
          var seen = state.getOption.getOrElse(Map.empty[String, Long])
          val evs = batch.toArray.sortBy(e => (usOf(e.ts), e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[WindowDistinct]
          var i = 0
          while (i < evs.length) {
            val t = usOf(evs(i).ts)
            var j = i
            while (j < evs.length && usOf(evs(j).ts) == t) {
              seen = seen.updated(evs(j).event_type, t)
              j += 1
            }
            seen = seen.filter { case (_, lastUs) => lastUs >= t - windowUs }
            val n = seen.size.toLong
            (i until j).foreach { k =>
              out += WindowDistinct(userId, evs(k).event_id, t, n)
            }
            i = j
          }
          state.update(seen)
          out.iterator
      }
  }

  /** Streaming data-quality monitor — q55's streaming face: the same
    * constraint counters (range, domain, null), accumulated over the
    * live stream as ONE unkeyed aggregate. State is four longs total
    * (constant, whatever the throughput) and every counter is a partial
    * agg — each micro-batch's contribution combines map-side before
    * touching state, so the monitor costs one pass of each batch and
    * nothing more. Update/Complete-mode sink = the dashboard row a
    * pipeline alerts on; violations-to-date equal the batch q55-style
    * aggregate over everything ingested (StreamingSpec pins parity).
    * The 'error' type is deliberately OUTSIDE the allowed domain:
    * the fixture produces real violations, so the parity check cannot
    * pass vacuously on zeros.
    */
  def dqMonitor(events: Dataset[Event]): DataFrame = {
    // the same per-row violation fold the batch constraint suites use
    // (Profiling.constraintReport) — one definition at rest and in flight
    import graft.queries.Profiling.rowViolations
    events.agg(
      count(lit(1)).as("total"),
      rowViolations(!col("value").between(0.0, 100.0)).as("v_range"),
      rowViolations(!col("event_type").isin("click", "purchase", "signup",
        "view")).as("v_domain"),
      rowViolations(col("ts").isNull).as("v_null_ts"))
  }

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
