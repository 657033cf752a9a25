package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.api.GridFields
import graft.multimodal.Multimodal
import graft.source.{GridFixtures, GridReader}
import graft.streaming.{EventStream, GridStream, MediaStream}

class StreamingSpec extends SparkSuite {

  test("cadence file stream: provenance time + windowed stats (AvailableNow)") {
    val dir = GridFixtures.ensure(spark, "stream13", n = 13)
    val schema = spark.read.parquet(new GridReader(spark, dir).files().head.path).schema
    val stream = GridStream.cadenceStream(spark, dir, schema, maxFilesPerTrigger = 4)
    val stats = GridStream.windowedStats(stream, "`T[K]`")
    val q = stats.writeStream
      .format("memory").queryName("grid_stats")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rows = spark.table("grid_stats").collect()
    // append mode emits only watermark-closed windows: with 13 steps and a
    // 20-min watermark, windows 0..9 are closed when the stream drains
    assert(rows.length >= 10, s"got ${rows.length} windows")
    val perWindow = rows.map(_.getLong(1)).distinct
    assert(perWindow.sameElements(Array(
      GridFixtures.lonAxis.length.toLong * GridFixtures.latAxis.length * GridFixtures.hAxis.length)))
  }

  test("foreachBatch registry refresh rebuilds interpolator from latest steps") {
    val dir = GridFixtures.ensure(spark, "stream-refresh", n = 5)
    val schema = spark.read.parquet(new GridReader(spark, dir).files().head.path).schema
    val stream = GridStream.cadenceStream(spark, dir, schema, maxFilesPerTrigger = 5)
    @volatile var latest: Option[GridFields] = None
    val q = GridStream.refreshingRegistry(spark, stream, dir, keepSteps = 3,
      kd => latest = Some(kd),
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(latest.isDefined, "registry never refreshed")
    val kd = latest.get
    // only the last 3 timesteps are in the refreshed grid
    val tb = kd.bounds("T")("time")
    val expLo = GridFixtures.t0.plusSeconds(2 * 600).getEpochSecond.toDouble
    val expHi = GridFixtures.t0.plusSeconds(4 * 600).getEpochSecond.toDouble
    assert(tb == ((expLo, expHi)), s"time bounds $tb")
    // and it evaluates correctly
    val t = expLo + 300
    assert(math.abs(kd.eval("T", Array(t, 0.0, 0.0, 300000.0)) -
      GridFixtures.temperature(t, 0.0, 0.0, 300000.0)) < 1e-6)
  }

  test("stateful running user totals via mapGroupsWithState") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val out = EventStream.runningUserTotals(mem.toDS())
    val q = out.writeStream.format("memory").queryName("user_totals")
      .outputMode("update").start()

    def ev(id: Long, u: Long, v: Double, s: Long) =
      EventStream.Event(id, new Timestamp(s * 1000), u, "e", v)

    mem.addData(ev(1, 1, 10.0, 100), ev(2, 1, 5.0, 200), ev(3, 2, 7.0, 150))
    q.processAllAvailable()
    mem.addData(ev(4, 1, 1.0, 300))
    q.processAllAvailable()
    val rows = spark.table("user_totals")
      .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("tv"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    q.stop()
    assert(rows(1L) == ((3L, 16.0)))
    assert(rows(2L) == ((1L, 7.0)))
  }

  test("dq monitor parity: streamed violation totals == one batch aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val evs = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event].collect()
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.dqMonitor(mem.toDS()).writeStream
      .format("memory").queryName("dq").outputMode("complete").start()
    evs.grouped(evs.length / 3 + 1).foreach { chunk =>
      mem.addData(chunk.toSeq); q.processAllAvailable()
    }
    val stream = spark.table("dq").collect().head
    q.stop()
    // batch truth: the identical aggregate over the full fixture
    val batch = EventStream.dqMonitor(
      Tables.events(spark, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[EventStream.Event]).collect().head
    assert(stream.toSeq == batch.toSeq,
      s"stream ${stream.toSeq} != batch ${batch.toSeq}")
    // non-vacuous: the fixture really violates range ('value' spikes past
    // 100) and domain ('error' events exist)
    assert(batch.getLong(1) > 0 && batch.getLong(2) > 0)
    assert(batch.getLong(3) == 0)
  }

  test("funnel parity: mapGroupsWithState == q45's batch stage counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // the batch truth: q45's chained per-user min-aggs → 3 stage counts
    val batch = SparkEntry.queries("q45_funnel")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // same events, chronological micro-batches (per-user event-time
    // ordered delivery — funnel's documented precondition, as sessionize)
    val evs = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
      .collect()
      .sortBy(e =>
        (e.ts.toInstant.getEpochSecond, e.ts.toInstant.getNano, e.event_id))
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.funnel(mem.toDS()).writeStream
      .format("memory").queryName("funnel").outputMode("update").start()
    evs.grouped(evs.length / 4 + 1).foreach { chunk =>
      mem.addData(chunk.toSeq); q.processAllAvailable()
    }
    // FunnelState fields are monotone (-1 → set-once), so max() over the
    // Update-mode snapshots is each user's final state
    val fin = spark.table("funnel").groupBy("user_id")
      .agg(max("t1_us").as("t1"), max("t2_us").as("t2"),
        max("t3_us").as("t3"))
    val stream = Map(
      1L -> fin.filter(col("t1") >= 0).count(),
      2L -> fin.filter(col("t2") >= 0).count(),
      3L -> fin.filter(col("t3") >= 0).count())
    q.stop()
    assert(stream == batch,
      s"stream funnel $stream != batch $batch")
  }

  test("transition parity: flatMapGroupsWithState == q52's batch matrix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // the batch truth: the full matrix — counts AND dwell-gap sums
    val batch = SparkEntry.queries("q52_event_transitions")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val evs = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
      .collect()
      .sortBy(e =>
        (e.ts.toInstant.getEpochSecond, e.ts.toInstant.getNano, e.event_id))
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.transitions(mem.toDS()).writeStream
      .format("memory").queryName("transitions").outputMode("append").start()
    evs.grouped(evs.length / 4 + 1).foreach { chunk =>
      mem.addData(chunk.toSeq); q.processAllAvailable()
    }
    // append-mode rows are final single transitions; aggregate to the
    // matrix the batch query emits
    val stream = spark.table("transitions")
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"), sum("gap_us").as("g"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    q.stop()
    assert(stream == batch, s"stream matrix != batch matrix")
  }

  test("ewma parity: stateful fold == q62's batch recurrence, bit-exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // batch truth: q62's LAST row per user — (n, ewma) at series end
    val batch = SparkEntry.queries("q62_ewma")(spark, dir)
      .groupBy("user_id")
      .agg(max("n").as("n"), max_by(col("ewma"), col("n")).as("ewma"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val evs = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
      .collect()
      .sortBy(e =>
        (e.ts.toInstant.getEpochSecond, e.ts.toInstant.getNano, e.event_id))
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.ewma(mem.toDS()).writeStream
      .format("memory").queryName("ewma").outputMode("update").start()
    evs.grouped(evs.length / 4 + 1).foreach { chunk =>
      mem.addData(chunk.toSeq); q.processAllAvailable()
    }
    // n is monotone, so the max-n snapshot is each user's final state;
    // strict double equality — same op sequence must mean same bits
    val stream = spark.table("ewma").groupBy("user_id")
      .agg(max("n").as("n"), max_by(col("ewma"), col("n")).as("ewma"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    q.stop()
    assert(stream == batch, "stream ewma != batch ewma (bit-exact)")
  }

  test("VAD parity: streaming open-run state == mm8's batch profile") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // batch truth: mm8's per-item profile
    val batch = SparkEntry.queries("mm8_audio_vad")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // per-item ordered delivery (the twin's contract): global sort by
    // (media_id, frame_idx) keeps each item's frames in order however
    // the chunking slices them
    val frames = Multimodal.audioFrameEnergies(
        Multimodal.mediaFromDocuments(spark, dir), frameSize = 32)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    val mem = MemoryStream[Multimodal.FrameEnergy]
    val q = MediaStream.vadProfile(mem.toDS()).writeStream
      .format("memory").queryName("vad").outputMode("update").start()
    frames.grouped(frames.length / 5 + 1).foreach { chunk =>
      mem.addData(chunk.toSeq); q.processAllAvailable()
    }
    // n_frames is monotone, so the max-n_frames snapshot is final state
    val stream = spark.table("vad").as[MediaStream.VadSnapshot].collect()
      .groupBy(_.media_id).map { case (id, snaps) =>
        val last = snaps.maxBy(_.n_frames)
        id -> ((last.n_frames, last.n_speech_frames,
          last.n_segments, last.max_seg_frames))
      }
    q.stop()
    assert(stream == batch, "stream VAD profile != batch mm8")
  }

  test("windowed-distinct parity: stateful type map == q53's batch bitmask") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // batch truth: q53's per-event trailing-hour distinct-type counts
    val batch = SparkEntry.queries("q53_window_distinct_types")(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap // event_id -> n
    val evs = Tables.events(spark, dir)
      .filter(col("user_id") < 20) // q53's slice
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
      .collect()
      .sortBy(e =>
        (e.ts.toInstant.getEpochSecond, e.ts.toInstant.getNano, e.event_id))
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.windowedDistinctTypes(mem.toDS()).writeStream
      .format("memory").queryName("wdistinct").outputMode("append").start()
    // chunk on µs boundaries — the operator's delivery precondition:
    // a same-µs run split across micro-batches may not see all its
    // RANGE-frame peers (mirrors q53's both-directions tie rule)
    val target = evs.length / 4 + 1
    var chunk = Vector.empty[EventStream.Event]
    def flush(): Unit =
      if (chunk.nonEmpty) {
        mem.addData(chunk); q.processAllAvailable(); chunk = Vector.empty
      }
    evs.foreach { e =>
      if (chunk.size >= target &&
          chunk.last.ts.toInstant != e.ts.toInstant) flush()
      chunk :+= e
    }
    flush()
    val stream = spark.table("wdistinct")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    q.stop()
    assert(stream.keySet == batch.keySet,
      s"row sets differ: ${stream.keySet.size} vs ${batch.keySet.size}")
    val bad = batch.collect { case (id, n) if stream(id) != n =>
      (id, n, stream(id)) }
    assert(bad.isEmpty, s"count mismatches (event, batch, stream): " +
      bad.take(5).toString)
  }

  test("attribution parity: flatMapGroupsWithState == q59's batch rollup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // the batch truth: per-touch-type purchase counts and milli revenue
    val batch = SparkEntry.queries("q59_attribution")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // delivery honors the operator's documented order precondition:
    // (µs, touches-before-purchases, event_id) — a same-µs touch must
    // not land in a later micro-batch than its purchase
    val evs = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
      .collect()
      .sortBy(e =>
        (e.ts.toInstant.getEpochSecond, e.ts.toInstant.getNano,
          if (e.event_type == "purchase") 1 else 0, e.event_id))
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.attribution(mem.toDS()).writeStream
      .format("memory").queryName("attribution").outputMode("append").start()
    evs.grouped(evs.length / 4 + 1).foreach { chunk =>
      mem.addData(chunk.toSeq); q.processAllAvailable()
    }
    val stream = spark.table("attribution")
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n"), sum("v_milli").as("rev"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    q.stop()
    // non-vacuous: attributed AND unattributed purchases must both occur
    assert(stream.keySet.size > 1, s"degenerate fixture: $stream")
    assert(stream == batch, s"stream attribution $stream != batch $batch")
  }

  test("sessionize parity: flatMapGroupsWithState == q19's batch windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    def canon(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // the batch truth: q19's stacked lag/running-count windows
    val batch = canon(SparkEntry.queries("q19_sessionize")(spark, dir)
      .select("user_id", "session_id", "n_events", "session_start_us")
      .collect())
    // the same events delivered as a chronological stream in micro-batches
    // (µs-exact order, so per-user cross-batch delivery is event-time
    // ordered — the sessionizer's documented precondition)
    val evs = Tables.events(spark, dir).filter(col("user_id") < 10)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
      .collect()
      .sortBy(e =>
        (e.ts.toInstant.getEpochSecond, e.ts.toInstant.getNano, e.event_id))
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(mem.toDS()).writeStream
      .format("memory").queryName("sessions").outputMode("append").start()
    evs.grouped(evs.length / 3 + 1).foreach { chunk =>
      mem.addData(chunk.toSeq); q.processAllAvailable()
    }
    // two far-future sentinel batches on a dummy user: the first raises
    // max event time (the watermark updates at batch END), the second
    // runs with the advanced watermark so EventTimeTimeout fires and the
    // real users' still-open sessions flush as final rows
    val far = evs.last.ts.toInstant.plusSeconds(86400)
    def sentinel(id: Long, plus: Long) = EventStream.Event(
      id, Timestamp.from(far.plusSeconds(plus)), 9999L, "flush", 0.0)
    mem.addData(sentinel(1000001L, 0)); q.processAllAvailable()
    mem.addData(sentinel(1000002L, 3600)); q.processAllAvailable()
    val stream = canon(spark.table("sessions")
      .filter(col("user_id") < 10)
      .select("user_id", "session_id", "n_events", "session_start_us")
      .collect())
    q.stop()
    assert(stream == batch, "stream sessions differ from the batch form: " +
      s"only-stream=${(stream -- batch).take(3)} only-batch=${(batch -- stream).take(3)}")
  }

  test("session_window stream == q38 batch: the native sessionizer agrees") {
    // q38 gates Spark's session_window operator in BATCH against the
    // DuckDB lag-island oracle; this pins the STREAMING deployment of the
    // same operator (watermark + append mode) to the q38 result, closing
    // the loop: oracle == batch == stream.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val batch = SparkEntry.queries("q38_session_window")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val evs = Tables.events(spark, dir).filter(col("user_id") < 10)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
      .collect()
      .sortBy(e =>
        (e.ts.toInstant.getEpochSecond, e.ts.toInstant.getNano, e.event_id))
    val mem = MemoryStream[EventStream.Event]
    val q = mem.toDS()
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min("ts")).as("session_start_us"))
      .select("user_id", "session_start_us", "n_events")
      .writeStream.format("memory").queryName("sw_sessions")
      .outputMode("append").start()
    evs.grouped(evs.length / 3 + 1).foreach { chunk =>
      mem.addData(chunk.toSeq); q.processAllAvailable()
    }
    // sentinel pair on a dummy user: first advances max event time (the
    // watermark updates at batch end), second runs under the advanced
    // watermark so all real sessions close and emit
    val far = evs.last.ts.toInstant.plusSeconds(86400)
    mem.addData(EventStream.Event(2000001L,
      Timestamp.from(far), 9999L, "flush", 0.0))
    q.processAllAvailable()
    mem.addData(EventStream.Event(2000002L,
      Timestamp.from(far.plusSeconds(3600)), 9999L, "flush", 0.0))
    q.processAllAvailable()
    val stream = spark.table("sw_sessions")
      .filter(col("user_id") < 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    assert(stream == batch, "streaming session_window diverged from q38: " +
      s"only-stream=${(stream -- batch).take(3)} only-batch=${(batch -- stream).take(3)}")
  }

  test("stream-stream interval join == batch: errors within 6 h of a purchase") {
    // the funnel/attribution shape: two event streams joined on key + a
    // time interval. Stream-stream inner joins need BOTH sides
    // watermarked and a time-bounded condition (that bound is what lets
    // Spark expire join state — without it state grows forever); the
    // batch truth is the identical join on the static frame.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val evs = Tables.events(spark, dir).filter(col("user_id") < 40)
      .select("event_id", "ts", "user_id", "event_type", "value")
    def side(df: org.apache.spark.sql.DataFrame, kind: String, p: String) =
      df.filter(col("event_type") === kind).select(
        col("event_id").as(s"${p}_id"), col("ts").as(s"${p}_ts"),
        col("user_id").as(s"${p}_user"))
    val joinCond = expr("a_user = b_user AND " +
      "b_ts >= a_ts AND b_ts <= a_ts + interval 6 hours")
    val batch = side(evs, "purchase", "a").join(side(evs, "error", "b"), joinCond)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture has no purchase→error pairs; widen the filter")

    val memA = MemoryStream[EventStream.Event]
    val memB = MemoryStream[EventStream.Event]
    def streamSide(m: MemoryStream[EventStream.Event], kind: String, p: String) =
      side(m.toDS().toDF(), kind, p).withWatermark(s"${p}_ts", "0 seconds")
    val q = streamSide(memA, "purchase", "a")
      .join(streamSide(memB, "error", "b"), joinCond)
      .select("a_id", "b_id")
      .writeStream.format("memory").queryName("ss_pairs")
      .outputMode("append").start()
    val rows = evs.as[EventStream.Event].collect().sortBy(e =>
      (e.ts.toInstant.getEpochSecond, e.ts.toInstant.getNano, e.event_id))
    rows.grouped(rows.length / 3 + 1).foreach { chunk =>
      memA.addData(chunk.toSeq); memB.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    // advance both watermarks so buffered matches flush
    val far = Timestamp.from(rows.last.ts.toInstant.plusSeconds(86400))
    memA.addData(EventStream.Event(3000001L, far, 9999L, "flush", 0.0))
    memB.addData(EventStream.Event(3000002L, far, 9999L, "flush", 0.0))
    q.processAllAvailable()
    val stream = spark.table("ss_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(stream == batch, "stream-stream pairs diverged from batch: " +
      s"only-stream=${(stream -- batch).take(3)} only-batch=${(batch -- stream).take(3)}")
  }

  test("stream-stream LEFT OUTER join == batch: null-extends after expiry") {
    // the outer variant of the attribution join: purchases with NO error
    // within 6 h must still emit, null-extended. In a stream that row can
    // only appear once the watermark proves no future match can arrive —
    // state for the purchase expires, the null row flushes. This is the
    // semantics a funnel/abandonment pipeline depends on, and it is
    // exactly what the inner-join test CANNOT witness; the batch truth is
    // the plain left join.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val evs = Tables.events(spark, dir).filter(col("user_id") < 40)
      .select("event_id", "ts", "user_id", "event_type", "value")
    // flush sentinels must traverse the join's watermark operators, so the
    // side filter lets event_type "flush" through (user 9999 matches no one)
    def side(df: org.apache.spark.sql.DataFrame, kind: String, p: String) =
      df.filter(col("event_type") === kind || col("event_type") === "flush")
        .select(col("event_id").as(s"${p}_id"), col("ts").as(s"${p}_ts"),
          col("user_id").as(s"${p}_user"))
    val joinCond = expr("a_user = b_user AND " +
      "b_ts >= a_ts AND b_ts <= a_ts + interval 6 hours")
    def canon(rows: Array[org.apache.spark.sql.Row]) = rows
      .filter(_.getLong(2) < 40) // drop the sentinel's own unmatched row
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    val batch = canon(side(evs, "purchase", "a")
      .join(side(evs, "error", "b"), joinCond, "left_outer")
      .select("a_id", "b_id", "a_user").collect())
    assert(batch.exists(_._2 == -1L),
      "fixture has no unmatched purchases; the outer case is vacuous")

    val memA = MemoryStream[EventStream.Event]
    val memB = MemoryStream[EventStream.Event]
    def streamSide(m: MemoryStream[EventStream.Event], kind: String, p: String) =
      side(m.toDS().toDF(), kind, p).withWatermark(s"${p}_ts", "0 seconds")
    val q = streamSide(memA, "purchase", "a")
      .join(streamSide(memB, "error", "b"), joinCond, "left_outer")
      .select("a_id", "b_id", "a_user")
      .writeStream.format("memory").queryName("ss_outer")
      .outputMode("append").start()
    val rows = evs.as[EventStream.Event].collect().sortBy(e =>
      (e.ts.toInstant.getEpochSecond, e.ts.toInstant.getNano, e.event_id))
    rows.grouped(rows.length / 3 + 1).foreach { chunk =>
      memA.addData(chunk.toSeq); memB.addData(chunk.toSeq)
      q.processAllAvailable()
    }
    // two sentinel rounds: the first advances the watermark past every
    // purchase's 6 h horizon, the second triggers the microbatch that
    // evicts the now-expired state and emits the null-extended rows
    (1 to 2).foreach { i =>
      val far = Timestamp.from(
        rows.last.ts.toInstant.plusSeconds(86400L * i))
      memA.addData(EventStream.Event(3000000L + 2 * i, far, 9999L, "flush", 0.0))
      memB.addData(EventStream.Event(3000001L + 2 * i, far, 9999L, "flush", 0.0))
      q.processAllAvailable()
    }
    val stream = canon(spark.table("ss_outer").collect())
    q.stop()
    assert(stream == batch, "outer stream-stream rows diverged from batch: " +
      s"only-stream=${(stream -- batch).take(3)} only-batch=${(batch -- stream).take(3)}")
  }

  test("stream-static join enriches the event stream with a dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[EventStream.Event]
    val enriched = mem.toDS().toDF()
      .join(dim, Seq("user_id"), "left")
      .select($"event_id", $"user_id", $"tier")
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    mem.addData(
      EventStream.Event(10L, new Timestamp(0), 1L, "e", 1.0),
      EventStream.Event(11L, new Timestamp(0), 3L, "e", 1.0))
    q.processAllAvailable()
    val rows = spark.table("enriched").collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    q.stop()
    assert(rows(10L).contains("gold"))
    assert(rows(11L).isEmpty) // left join keeps unmatched stream rows
  }

  test("streaming dedup drops re-delivered event ids within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val out = EventStream.dedupedEvents(mem.toDS())
    val q = out.writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    def ev(id: Long, s: Long) =
      EventStream.Event(id, new Timestamp(1700000000000L + s * 1000), 1L, "e", 1.0)
    mem.addData(ev(1, 0), ev(2, 10), ev(1, 5)) // id 1 delivered twice
    q.processAllAvailable()
    mem.addData(ev(2, 20), ev(3, 30)) // id 2 re-delivered in a later batch
    q.processAllAvailable()
    val ids = spark.table("deduped").select("event_id")
      .collect().map(_.getLong(0)).sorted
    q.stop()
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("deterministic sampling keeps the same rows on a stream as in batch") {
    import graft.operators.DeterministicSample
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // membership is a pure function of the key, so online ingest sampling
    // and a later batch re-run select the SAME rows — the property that
    // makes a streamed corpus mix reproducible (sample() cannot run on a
    // stream at all, and would not be stable if it could)
    val events = (0L until 512L).map(i =>
      EventStream.Event(i, new Timestamp(1700000000000L + i), i % 7, "e", 1.0))
    val mem = MemoryStream[EventStream.Event]
    val sampled = DeterministicSample.stratified(
      mem.toDS().toDF(), col("event_id"), col("event_type"),
      Map("e" -> 0.3))
    val q = sampled.writeStream.format("memory").queryName("sampled_stream")
      .outputMode("append").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sampled_stream")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val batch = DeterministicSample.stratified(
        events.toDF(), col("event_id"), col("event_type"), Map("e" -> 0.3))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty && streamed.size < 512)
  }

  test("decontamination joins a doc stream against the static eval set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // incoming docs screened online against the (static, broadcast)
    // benchmark shingles — the ingest-time form of dd10; stream and a
    // later batch re-run must flag the identical pairs
    val evalDocs = Seq((1000L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon eta"), // 3 shared shingles
      (2L, "alpha beta gamma theta iota kappa"),  // 1 shared
      (3L, "unrelated words entirely here now"))  // 0 shared
    val mem = MemoryStream[(Long, String)]
    val flagged = graft.queries.Dedup.decontaminate(
      mem.toDS().toDF("doc_id", "text"), evalDocs, minShared = 3)
    val q = flagged.writeStream.format("memory").queryName("decon_stream")
      .outputMode("complete").start()
    mem.addData(train: _*)
    q.processAllAvailable()
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("train_id", "eval_id", "n_shared").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = canon(spark.table("decon_stream"))
    val batch = canon(graft.queries.Dedup.decontaminate(
      train.toDF("doc_id", "text"), evalDocs, minShared = 3))
    assert(streamed == batch)
    assert(streamed == Set((1L, 1000L, 3L)))
  }

  test("sharded MG stream: candidates complete, pass-2 == t25 batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // the same trigram stream t25 scans (Text.trigrams — the one
    // definition), delivered as micro-batches
    val grams = graft.queries.Text.trigrams(
        Tables.documents(spark, dir)
          .select(graft.functions.TextFunctions.tokens(col("text")).as("t")))
      .as[String].collect()
    val mem = MemoryStream[String]
    val q = graft.streaming.SketchStream.mgShards(mem.toDS(),
        m = 16384, shards = 4)
      .writeStream.format("memory").queryName("mg_shards")
      .outputMode("update").start()
    grams.grouped(grams.length / 5 + 1).foreach { c =>
      mem.addData(c.toSeq); q.processAllAvailable()
    }
    q.stop()
    // n is monotone per shard, so max-n is each shard's final summary
    val latest = spark.table("mg_shards").groupBy("shard")
      .agg(max_by(col("keys"), col("n")).as("keys"), max("n").as("n"))
    val cands = latest.select(explode(col("keys")).as("g"))
      .as[String].collect().toSet
    val n = latest.agg(sum("n")).head().getLong(0)
    assert(n == grams.length, s"stream length $n != ${grams.length}")
    val exact = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // completeness at the batch bound: no heavy gram may be lost
    exact.filter(_._2 > n.toDouble / 16385).keys.foreach { k =>
      assert(cands(k), s"heavy gram $k lost in stream")
    }
    // pass-2 (exact counts over streamed candidates at t25's threshold)
    // must equal the batch query's gated frame
    val thr = math.max(2L, math.ceil(7.5e-5 * n).toLong)
    val pass2 = exact.filter { case (k, c) => cands(k) && c >= thr }
    val batch = SparkEntry.queries("t25_hot_ngrams")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pass2 == batch, "streamed pass-2 != t25 batch frame")
  }

  test("sharded MG stream keeps heavy keys through cross-batch compaction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(19)
    // m=16 forces real compaction in every shard; 2 hot keys + long tail
    val stream = rnd.shuffle(
      Seq.fill(500)("hot1") ++ Seq.fill(320)("hot2") ++
        (0 until 2500).map(i => s"cold${i % 600}"))
    val mem = MemoryStream[String]
    val q = graft.streaming.SketchStream.mgShards(mem.toDS(),
        m = 16, shards = 3)
      .writeStream.format("memory").queryName("mg_small")
      .outputMode("update").start()
    stream.grouped(stream.length / 6 + 1).foreach { c =>
      mem.addData(c.toSeq); q.processAllAvailable()
    }
    q.stop()
    val latest = spark.table("mg_small").groupBy("shard")
      .agg(max_by(col("keys"), col("n")).as("keys"), max("n").as("n"))
    val cands = latest.select(explode(col("keys")).as("g"))
      .as[String].collect().toSet
    val n = stream.length
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
    exact.filter(_._2 > n.toDouble / 17).keys.foreach { k =>
      assert(cands(k), s"heavy key $k lost across micro-batches")
    }
  }

  test("GridFields.withUnitsMetadata attaches units to StructFields") {
    val dir = GridFixtures.ensure(spark, "units-meta", n = 2)
    val df = new GridReader(spark, dir).fetch(
      GridFixtures.t0, GridFixtures.t0.plusSeconds(600), 250000.0, 400000.0)
    val withMd = graft.api.GridFields.withUnitsMetadata(df)
    val md = withMd.schema("rho[kg/m^3]").metadata
    assert(md.getString("units") == "kg/m^3" && md.getString("name") == "rho")
    assert(withMd.schema("T[K]").metadata.getString("units") == "K")
    assert(!withMd.schema("lon").metadata.contains("units"))
  }

  test("file-stream restart from checkpoint is exactly-once") {
    // the ingest-reliability property every other streaming claim stands
    // on: a run processes what's there, dies (here: AvailableNow stop),
    // more files land, a RESTART with the same checkpoint picks up ONLY
    // the new files, and the file-sink commit log keeps rows exactly
    // once end-to-end — no dupes from reprocessing, no holes from the
    // handoff. At 100 TB this is the contract that makes a crashed
    // ingest job resumable instead of restartable-from-zero.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ckpt_").toFile
    try {
      val in = tmp.getAbsolutePath + "/in"
      val out = tmp.getAbsolutePath + "/out"
      val ckpt = tmp.getAbsolutePath + "/ckpt"
      new java.io.File(in).mkdirs()
      def land(ids: Range, part: String): Unit =
        ids.map(i => s"""{"doc_id": $i, "n": ${i * 10}}""").toDF("value")
          .coalesce(1).write.mode("append").text(s"$in/$part")
      def runOnce(): Unit = {
        val q = spark.readStream
          .schema("doc_id LONG, n LONG")
          .option("recursiveFileLookup", "true")
          .json(in)
          .writeStream
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      land(0 until 50, "batch_a")
      runOnce()
      land(50 until 80, "batch_b")
      runOnce()
      val rows = spark.read.parquet(out).collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      assert(rows.length == 80, s"expected 80 rows exactly once, got ${rows.length}")
      assert(rows.toSet == (0 until 80).map(i => i.toLong -> i * 10L).toSet)
    } finally graft.util.Fs.rmTree(tmp)
  }

  test("watermarked sliding-window event rates emit closed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val out = EventStream.eventRates(spark, mem.toDS())
    val q = out.writeStream.format("memory").queryName("rates")
      .outputMode("append").start()
    def ev(id: Long, t: String, v: Double, minute: Long) =
      EventStream.Event(id, Timestamp.valueOf(f"2024-01-01 01:$minute%02d:00"),
        1L, t, v)
    mem.addData(ev(1, "a", 1.0, 0), ev(2, "a", 3.0, 2), ev(3, "b", 5.0, 7))
    q.processAllAvailable()
    // advance watermark far past the first windows
    mem.addData(ev(4, "a", 1.0, 59))
    q.processAllAvailable()
    mem.addData(ev(5, "a", 1.0, 59))
    q.processAllAvailable()
    val rows = spark.table("rates").collect()
    q.stop()
    assert(rows.nonEmpty)
    // type 'a' window [01:00,01:10) contains events 1+2
    val w0 = rows.find(r => r.getString(1) == "a" &&
      r.getTimestamp(0) == Timestamp.valueOf("2024-01-01 01:00:00"))
    assert(w0.isDefined && w0.get.getLong(2) == 2L)
  }
  test("streaming IVF maintenance: assignments == batch ivfAssign, live cell counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.VectorStream
    import graft.functions.VectorFunctions.normalized
    val sf = "/root/testdata/sf0.001"
    val units = Tables.spread(Tables.embeddings(spark, sf))
      .select(col("vec_id"), normalized(col("embedding")).as("unit"))
    // the memoized quantizer: s4's every-53rd-unit centroids, extracted
    // ONCE — streaming never re-derives them (that is the point: the
    // index serves without rebuilds)
    val cents = units.filter(col("vec_id") % 53 === 0)
      .select("vec_id", "unit").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    assert(cents.size >= 5)
    // batch truth: the s4 assignment over the full (union) table
    val batchAssign = graft.queries.Similarity.assignFromUnits(units)
      .select("vec_id", "cent_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // stream the same vectors in three micro-batches
    val rows = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq
    val chunks = rows.grouped((rows.size + 2) / 3).toSeq
    val mem = MemoryStream[(Long, Seq[Float])]
    // plain-dot form: the EXACT ranking batch ivfAssign uses for its
    // unit centroids (the k-means-objective form agrees only in exact
    // arithmetic — see assignAgainst's doc)
    val assigned = VectorStream.assignAgainst(
      mem.toDS().toDF("vec_id", "embedding")
        .withColumn("unit", normalized(col("embedding"))),
      cents, kmeansObjective = false)
    val qa = assigned.select("vec_id", "cent_id")
      .writeStream.format("memory").queryName("ivf_assign_stream")
      .outputMode("append").start()
    val qc = VectorStream.cellCounts(
        assigned.select(col("cent_id")).as[Long])
      .toDF().writeStream.format("memory").queryName("ivf_cells_stream")
      .outputMode("update").start()
    chunks.foreach { c =>
      mem.addData(c: _*)
      qa.processAllAvailable(); qc.processAllAvailable()
    }
    qa.stop(); qc.stop()
    val streamed = spark.table("ivf_assign_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batchAssign,
      s"streamed assignment diverges: only-stream=${(streamed -- batchAssign).take(5)} only-batch=${(batchAssign -- streamed).take(5)}")
    // live counts: the latest emission per cell equals the batch GROUP BY
    val finalCounts = spark.table("ivf_cells_stream")
      .groupBy("cent_id").agg(max("n_vectors").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batchCounts = batchAssign.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(finalCounts == batchCounts,
      s"cell counts diverge: $finalCounts vs $batchCounts")
    assert(batchCounts.values.sum == rows.size.toLong)
    // the stateful counts really accumulated ACROSS batches: update
    // mode re-emits a touched cell every trigger, so a cell hit in two
    // micro-batches appears twice in the sink — more emissions than
    // distinct cells proves cross-batch state (a state store that reset
    // each batch would still end at per-batch counts, not totals)
    assert(spark.table("ivf_cells_stream").count() > finalCounts.size,
      "no cell was touched by more than one micro-batch — vacuous")
    // both scoring forms agree on this fixture (unit centroids): the
    // trained-form path is exercised and consistent
    val kmeans = VectorStream.assignAgainst(
        units.select(col("vec_id"), col("unit")), cents)
      .select("vec_id", "cent_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kmeans == batchAssign,
      "k-means-objective form diverges from plain dot on unit centroids")
  }

  test("streamed IVF scorer keeps Catalyst's NaN/total double order " +
    "(ADVICE r11)") {
    import spark.implicits._
    import graft.streaming.VectorStream
    // Spark SQL ranks NaN above every double: a row whose scores are
    // ALL NaN must still pick a centroid (the smallest id among the
    // ties — what the replaced Catalyst fold did), and one NaN-scoring
    // centroid outranks every finite score. The compiled loop's bare
    // `>` was false for NaN and leaked bestId = Long.MaxValue — an id
    // that is not a cell.
    val cents: Seq[(Long, Seq[Double])] =
      Seq(5L -> Seq(Double.NaN), 7L -> Seq(1.0))
    val rows = Seq(
      (1L, Seq(0.5)), // scores: NaN (cent 5) vs finite (cent 7)
      (2L, Seq(Double.NaN))) // all scores NaN → tie to smallest id
      .toDF("vec_id", "unit")
    for (obj <- Seq(true, false)) {
      val got = VectorStream
        .assignAgainst(rows, cents, kmeansObjective = obj)
        .select("vec_id", "cent_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 5L, 2L -> 5L),
        s"NaN ordering diverges from Catalyst (obj=$obj): $got")
    }
  }

  test("ingest-time quality scoring + blocklist tagging: stream == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // t29's codegen expression and t31's broadcast automaton are both
    // stateless per-row maps, so they run UNCHANGED on a streaming frame
    // (append mode, no watermark, no state) — the ingest-time corpus
    // tagging shape. Parity: the streamed tags must equal the batch
    // queries' rows for the same docs.
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val w = org.apache.spark.sql.functions.typedlit(
      graft.queries.Text.QualityWeights)
    val ac = spark.sparkContext.broadcast(
      new graft.functions.AhoCorasick(graft.queries.Text.BigBlocklist))
    val hitsUdf = udf((t: String) => ac.value.matchedPatterns(t).sorted)
    val tagged = mem.toDS().toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.TextFunctions.linearTextScore(col("text"), w)
          .as("quality_score"),
        array_join(hitsUdf(lower(col("text"))), ",").as("hits"))
    val q = tagged.writeStream.format("memory").queryName("tag_stream")
      .outputMode("append").start()
    docs.grouped((docs.size + 1) / 2).foreach { c =>
      mem.addData(c: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("tag_stream").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    val batchQ = SparkEntry.queries("t29_quality_score")(spark, sf)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batchB = SparkEntry.queries("t31_blocklist_automaton")(spark, sf)
      .select("doc_id", "hits").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = docs.map { case (id, _) => (id, batchQ(id), batchB(id)) }.toSet
    assert(streamed == want,
      s"ingest tags diverge from batch (sample diff: ${(streamed -- want).take(3)})")
    assert(streamed.exists(_._3.nonEmpty), "fixture has no blocklist hits — vacuous")
  }

  test("streaming drift monitor: live PSI == batch p18 on the same split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // p18's snapshots: reference = even doc_ids, current = odd. Stream
    // the CURRENT half as micro-batches through DriftStream's stateful
    // bin counts, score against the statically-built reference
    // histogram, and demand the live PSI equals the batch gate's
    // psi_total on the full table — same binning (Profiling.psiBin),
    // same spine, same smoothing arithmetic (Profiling.psiOverCounts).
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val curBins = docs.filter(col("doc_id") % 2 =!= 0)
      .select(graft.queries.Profiling.psiBin("n_chars")).as[Long]
      .collect().toSeq
    val reference = docs.filter(col("doc_id") % 2 === 0)
      .groupBy(graft.queries.Profiling.psiBin("n_chars").as("bin"))
      .agg(count(lit(1)).as("n_ref"))

    val mem = MemoryStream[Long]
    val q = graft.streaming.DriftStream.binCounts(mem.toDS())
      .writeStream.format("memory").queryName("drift_bins")
      .outputMode("update").start()
    curBins.grouped((curBins.size + 2) / 3).foreach { c =>
      mem.addData(c: _*); q.processAllAvailable()
    }
    q.stop()

    val live = graft.streaming.DriftStream.psiAgainst(
      spark.table("drift_bins"), reference)
    val batch = SparkEntry.queries("p18_drift_psi")(spark, sf)
    // per-bin counts AND terms bit-match (same longs through the same
    // expression tree); the folded total only up to summation order
    def byBin(df: org.apache.spark.sql.DataFrame) =
      df.select("bin", "n_ref", "n_cur", "psi_term").collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val liveBins = byBin(live)
    assert(liveBins == byBin(batch),
      "streamed histogram/terms != batch p18")
    val livePsi = live.agg(max("psi_total")).head().getDouble(0)
    val batchPsi = batch.agg(max("psi_total")).head().getDouble(0)
    assert(math.abs(livePsi - batchPsi) <= 1e-12 * math.abs(batchPsi),
      s"streamed PSI $livePsi != batch $batchPsi")
    assert(liveBins.values.map(_._2).sum == curBins.size,
      "streamed counts lost documents")
  }

  test("transformWithState drift counts == mapGroupsWithState (Spark 4 API)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the same bin stream through BOTH state APIs; the new-API query
    // needs the RocksDB provider, scoped to this test and restored after
    val sf = "/root/testdata/sf0.001"
    val curBins = Tables.documents(spark, sf)
      .filter(col("doc_id") % 2 =!= 0)
      .select(graft.queries.Profiling.psiBin("n_chars")).as[Long]
      .collect().toSeq
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Long]
      val q = graft.streaming.DriftStream.binCountsTws(mem.toDS())
        .writeStream.format("memory").queryName("drift_bins_tws")
        .outputMode("update").start()
      curBins.grouped((curBins.size + 2) / 3).foreach { c =>
        mem.addData(c: _*); q.processAllAvailable()
      }
      q.stop()
      val tws = spark.table("drift_bins_tws")
        .groupBy("bin").agg(max("n").as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // truth: exact per-bin counts of the streamed half
      val exact = curBins.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      assert(tws == exact,
        s"transformWithState counts diverge: $tws vs $exact")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("ingest near-dup screen: streamed pairs ⊇ dd3 with identical estimates, clusters fold") {
    import spark.implicits._
    import graft.streaming.{ClusterStream, NearDupStream}
    val sf = "/root/testdata/sf0.001"
    val dd3 = SparkEntry.queries("dd3_minhash_lsh")(spark, sf).collect()
    assert(dd3.nonEmpty, "no dd3 pairs at this SF — vacuous")
    val cap = dd3.head.getLong(3).toInt // the batch-derived cap_bucket knob
    val batchPairs = dd3
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val screen = new NearDupStream.PairScreen(spark, cap)
    val clusters = new ClusterStream.ComponentMap(spark)
    val streamed = scala.collection.mutable.Map.empty[(Long, Long), Double]
    try {
      docs.grouped((docs.size + 2) / 3).foreach { c =>
        val pairs = screen.ingest(c.toDF("doc_id", "text"))
        pairs.collect().foreach { r =>
          streamed((r.getLong(0), r.getLong(1))) = r.getDouble(2)
        }
        clusters.ingest(pairs.select("i", "j"))
        graft.operators.Checkpoints.free(pairs)
      }
      // no-misses half of the contract: every batch pair, same estimate
      batchPairs.foreach { case (k, est) =>
        assert(streamed.contains(k), s"batch dd3 pair $k missed by the screen")
        assert(streamed(k) == est, s"estimate differs on $k")
      }
      val extras = streamed.keySet -- batchPairs.keySet
      // extras (if any) are exactly what the batch whole-bucket cap
      // suppressed; all carry the same ≥ 0.5 floor by construction
      assert(extras.forall(k => streamed(k) >= 0.5))
      info(s"streamed ${streamed.size} pairs (${extras.size} extras vs " +
        s"batch ${batchPairs.size})")
      // the composed fold: the live cluster map equals an independent
      // union-find over everything the screen emitted
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      streamed.keys.foreach { case (i, j) =>
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) { val m = math.min(ri, rj)
          parent(math.max(ri, rj)) = m }
      }
      val want = streamed.keySet.flatMap(p => Seq(p._1, p._2))
        .map(n => (n, find(n))).toSet
      val got = clusters.snapshot.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, "composed cluster map diverges from union-find")
    } finally {
      screen.close()
      clusters.close()
    }
  }

  test("ingest near-dup screen: compaction is invisible — per-batch pairs " +
    "and state sizes identical across compaction boundaries (ADVICE r11)") {
    import spark.implicits._
    import graft.streaming.NearDupStream
    val sf = "/root/testdata/sf0.001"
    val dd3 = SparkEntry.queries("dd3_minhash_lsh")(spark, sf).collect()
    assert(dd3.nonEmpty, "no dd3 pairs at this SF — vacuous")
    val cap = dd3.head.getLong(3).toInt
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    // 7 micro-batches against a period of 2 → three compactions fire
    // mid-stream (and one frees parts a batch-old pairs frame could
    // still lazily reference — the ordering bug class this pins); the
    // control screen's period is past the batch count, so it never
    // compacts. Everything observable must be identical.
    val compacting =
      new NearDupStream.PairScreen(spark, cap, compactEvery = 2)
    val control =
      new NearDupStream.PairScreen(spark, cap, compactEvery = 100)
    try {
      var compactionsCrossed = 0
      docs.grouped(math.max(1, (docs.size + 6) / 7)).zipWithIndex
        .foreach { case (c, bi) =>
          val df = c.toDF("doc_id", "text")
          val p1 = compacting.ingest(df)
          val p2 = control.ingest(df)
          def pairsOf(p: org.apache.spark.sql.DataFrame) =
            p.collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
              .toSet
          assert(pairsOf(p1) == pairsOf(p2),
            s"batch $bi pairs diverge across a compaction boundary")
          val (s1, s2) = (compacting.stateSizes, control.stateSizes)
          assert(s1 == s2,
            s"batch $bi state sizes diverge: compacting=$s1 control=$s2")
          if (bi > 0 && bi % 2 == 1) compactionsCrossed += 1
          graft.operators.Checkpoints.free(p1)
          graft.operators.Checkpoints.free(p2)
        }
      assert(compactionsCrossed >= 2,
        "fixture too shallow — no compaction boundary was crossed")
    } finally { compacting.close(); control.close() }
  }

  test("ingest curation parity: streamed pipeline == p8's batch accounting") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.IngestPipeline
    import graft.queries.{Dedup, Text}
    val sf = "/root/testdata/sf0.001"
    val batchTruth = SparkEntry.queries("p8_full_pipeline")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val docsAll = Tables.documents(spark, sf)
    val evalDocs = docsAll.filter(col("doc_id") % 97 === 0)
      .select("doc_id", "text")
    // reference mixture stats derived through the SAME stage helpers the
    // batch query composes — the parity setup's honest reference
    val rep = Text.repCleanDocs(docsAll).filter(col("doc_id") % 97 =!= 0)
    val flagged = Dedup.decontaminate(rep.select("doc_id", "text"),
        evalDocs, 3)
      .select(col("train_id").as("doc_id")).distinct()
    val clean = rep.join(flagged, Seq("doc_id"), "left_anti")
    val nClean = clean.count()
    val refStats = Text.exactDedupMeta(clean)
      .groupBy("lang").agg(count(lit(1)).as("n_lang"))
      .as[(String, Long)].collect().toSeq.toDF("lang", "n_lang")
    // id-ordered arrival: first-seen winner == the batch global min
    val train = docsAll.filter(col("doc_id") % 97 =!= 0)
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    val pipeline = new IngestPipeline.Curation(spark, evalDocs, refStats)
    val mem = MemoryStream[(Long, String, String)]
    val q = IngestPipeline.maintain(
      mem.toDS().toDF("doc_id", "lang", "text"), pipeline)
    try {
      val chunks = train.grouped((train.size + 2) / 3).toSeq
      chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val streamed = pipeline.accounting.collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(streamed == batchTruth,
        s"streamed accounting diverges from p8: " +
          s"stream=$streamed batch=$batchTruth")
      val nKeys = pipeline.corpusKeys.count()
      assert(nKeys > 0 && nKeys <= nClean)
      // non-vacuity of the incremental screen: RE-DELIVER the first
      // batch (at-least-once delivery). Every re-delivered text is
      // already in the key set, so the accounting must NOT move — a
      // pipeline without the cross-batch anti-join would double-count
      mem.addData(chunks.head: _*); q.processAllAvailable()
      val afterRedelivery = pipeline.accounting.collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(afterRedelivery == batchTruth,
        "re-delivered batch changed the accounting — the incremental " +
          "dedup screen did not absorb it")
      assert(pipeline.corpusKeys.count() == nKeys,
        "re-delivery grew the key set")
    } finally {
      q.stop()
      pipeline.close()
    }
  }

  test("incremental cluster maintenance: streamed map == batch dd8, re-delivery safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.ClusterStream
    val sf = "/root/testdata/sf0.001"
    // the gated pair list and the batch truth it folds to
    val pairs = SparkEntry.queries("dd2_shingle_jaccard")(spark, sf)
      .select("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.size >= 6, "fixture has too few near-dup pairs — vacuous")
    val batchMap = SparkEntry.queries("dd8_neardup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // adversarial arrival order (hash-scrambled, deterministic), three
    // micro-batches, plus batch 1 RE-DELIVERED at the end (at-least-once
    // delivery): union-find must absorb all of it
    val scrambled = pairs.sortBy { case (i, j) =>
      ((i * 2654435761L + j) % 997L, i, j)
    }
    val chunks0 = scrambled.grouped((scrambled.size + 2) / 3).toSeq
    val chunks = chunks0 :+ chunks0.head
    val state = new ClusterStream.ComponentMap(spark)
    val mem = MemoryStream[(Long, Long)]
    val q = ClusterStream.maintain(mem.toDS().toDF("i", "j"), state)
    try {
      var prevSize = 0L
      chunks.zipWithIndex.foreach { case (c, ix) =>
        mem.addData(c: _*)
        q.processAllAvailable()
        val snap = state.snapshot.count()
        // the map only grows (nodes never leave a component)
        assert(snap >= prevSize, s"map shrank at batch $ix")
        prevSize = snap
      }
      val streamed = state.snapshot.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed.map(t => (t._1, t._2)) == batchMap.map {
          case (doc, rep) => (doc, rep)
        },
        s"streamed map diverges from batch dd8: " +
          s"only-stream=${(streamed -- batchMap).take(5)} " +
          s"only-batch=${(batchMap -- streamed).take(5)}")
      // the merge machinery genuinely ran incrementally: at least one
      // mid-stream snapshot was smaller than the final map (labels
      // arrived over multiple batches, not one)
      assert(chunks0.head.size < pairs.size, "single-batch split — vacuous")
    } finally {
      q.stop()
      state.close()
    }
  }

  test("SummaryStream: streamed state == one-shot summary; re-delivery " +
    "no-op; maintained summary serves the q68 rule") {
    import graft.plans.SummaryRewrite
    import graft.streaming.SummaryStream
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val base = s"$sf/lineitem.parquet"
    val keys = Seq("l_returnflag", "l_linestatus")
    val ms = Seq("l_quantity", "l_extendedprice")
    val rows = spark.read.parquet(base)
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    val chunks = rows.grouped((rows.size + 2) / 3).toSeq
    assert(chunks.size == 3, "fixture split degenerate")
    implicit val sqlCtx = spark.sqlContext
    val state = new SummaryStream.SummaryState(keys, ms)
    val mem = MemoryStream[(String, String, Double, Double)]
    val q = SummaryStream.maintain(
      mem.toDS().toDF("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice"),
      state)
    val tmp = java.nio.file.Files.createTempDirectory("sumstream").toString
    try {
      chunks.foreach { c => mem.addData(c: _*); q.processAllAvailable() }
      val got = state.snapshot.get.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
      val want = SummaryRewrite.buildSummary(
          spark.read.parquet(base), keys, ms).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
      assert(got.keySet == want.keySet)
      // states: cnt, (sum, cnt, min, max) per measure — quantity sums are
      // integer-valued doubles (exact in any merge order); price sums get
      // the 1e-9 envelope (association differs batch-vs-one-shot)
      got.foreach { case (k, g) =>
        val w = want(k)
        g.zip(w).zipWithIndex.foreach { case ((gv, wv), ix) =>
          (gv, wv) match {
            case (a: Double, b: Double) =>
              assert(math.abs(a - b) <= 1e-9 * math.max(math.abs(b), 1.0),
                s"$k state $ix: $a != $b")
            case _ => assert(gv == wv, s"$k state $ix: $gv != $wv")
          }
        }
      }
      // re-delivered batch id (restart replay) must be a no-op
      val before = got
      state.ingest(chunks.head
        .toDF("l_returnflag", "l_linestatus", "l_quantity",
          "l_extendedprice"), batchId = 0L)
      val after = state.snapshot.get.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.toSeq.drop(2)).toMap
      assert(after == before, "re-delivered batchId mutated the state")
      // composition: the stream-maintained summary serves SummaryRewrite
      state.snapshot.get.coalesce(1)
        .write.mode("overwrite").parquet(s"$tmp/summary")
      GraftExtensions.register(spark)
      spark.conf.set(SummaryRewrite.BaseConf, base)
      spark.conf.set(SummaryRewrite.PathConf, s"$tmp/summary")
      spark.conf.set(SummaryRewrite.KeysConf, keys.mkString(","))
      spark.conf.set(SummaryRewrite.MeasuresConf, ms.mkString(","))
      try {
        val naive = spark.read.parquet(base)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n_rows"),
            sum("l_quantity").as("sum_qty"),
            min("l_extendedprice").as("min_price"))
        val scans = naive.queryExecution.optimizedPlan.collect {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation match {
              case h: org.apache.spark.sql.execution.datasources
                  .HadoopFsRelation => h.location.rootPaths.map(_.toString)
              case _ => Seq.empty[String]
            }
        }.flatten
        assert(scans.nonEmpty && scans.forall(_.contains("sumstream")),
          s"rule not served from the maintained summary: $scans")
        val served = naive.collect()
          .map(r => (r.getString(0), r.getString(1)) ->
            (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
        spark.conf.unset(SummaryRewrite.BaseConf)
        val truth = spark.read.parquet(base)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n_rows"),
            sum("l_quantity").as("sum_qty"),
            min("l_extendedprice").as("min_price"))
          .collect()
          .map(r => (r.getString(0), r.getString(1)) ->
            (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
        assert(served == truth,
          s"stream-served != truth: ${served.toSeq.diff(truth.toSeq).take(3)}")
      } finally {
        Seq(SummaryRewrite.BaseConf, SummaryRewrite.PathConf,
          SummaryRewrite.KeysConf, SummaryRewrite.MeasuresConf)
          .foreach(spark.conf.unset)
      }
    } finally {
      q.stop()
      state.close()
      graft.util.Fs.rmTree(new java.io.File(tmp))
    }
  }

  test("streaming k-anonymity monitor: live audit == batch p21") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // stream EVERY document's QI key (p21's exact bucketing) in
    // micro-batches through PrivacyStream's stateful class counts; the
    // folded audit must equal the batch release gate row-for-row —
    // same classes, same counts, same verdicts, same suppression cost
    val sf = "/root/testdata/sf0.001"
    val keys = Tables.documents(spark, sf)
      .select(col("lang"), col("source"),
        expr("n_chars DIV 100").as("lenBucket"))
      .as[graft.streaming.PrivacyStream.QiKey].collect().toSeq
    val mem = MemoryStream[graft.streaming.PrivacyStream.QiKey]
    val q = graft.streaming.PrivacyStream.classCounts(mem.toDS())
      .writeStream.format("memory").queryName("qi_counts")
      .outputMode("update").start()
    keys.grouped((keys.size + 3) / 4).foreach { c =>
      mem.addData(c: _*); q.processAllAvailable()
    }
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("lang", "source", "len_bucket", "n_docs", "at_risk",
          "suppression_cost")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4), r.getLong(5))).toSet
    val live = rows(graft.streaming.PrivacyStream.audit(
      spark.table("qi_counts")))
    val batch = rows(SparkEntry.queries("p21_k_anonymity")(spark, sf))
    assert(live == batch,
      s"live audit != batch p21 (diff: ${(live -- batch).take(3)} / " +
        s"${(batch -- live).take(3)})")
    // the monitor's point is the live VERDICT: both verdict classes
    // must be populated, or the parity is vacuous
    assert(live.exists(_._5) && live.exists(!_._5),
      "fixture vacuous: need both at-risk and safe classes")
  }

  test("streaming geo occupancy: live cell profile == batch q71") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // stream every point (q71's exact quantization, done up front so
    // stream and batch cell identically) in micro-batches; the folded
    // live profile must equal the batch layout profile row-for-row —
    // counts AND extrema. sf0.1 deliberately: the (klon, klat) lattice
    // has period 14400, so multi-point cells (the rows where count and
    // extrema folding actually carry state) only exist above 14400
    // points — smaller SFs make the parity vacuously per-point
    val sf = "/root/testdata/sf0.1"
    val pts = Tables.events(spark, sf).select(
        expr("(event_id * 7919) % 3600").as("klon"),
        expr("(event_id * 104729) % 1600").as("klat"))
      .withColumn("qlon", expr("(klon * 256) DIV 3600"))
      .withColumn("qlat", expr("(klat * 256) DIV 1600"))
      .withColumn("cell", graft.functions.LayoutFunctions.morton8(
        col("qlon"), col("qlat")))
      .select(col("cell"), col("klon"), col("klat"))
      .as[graft.streaming.GeoStream.CellPoint].collect().toSeq
    val mem = MemoryStream[graft.streaming.GeoStream.CellPoint]
    val q = graft.streaming.GeoStream.cellProfiles(mem.toDS())
      .writeStream.format("memory").queryName("geo_cells")
      .outputMode("update").start()
    pts.grouped((pts.size + 3) / 4).foreach { c =>
      mem.addData(c: _*); q.processAllAvailable()
    }
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("cell", "n_points", "klon_min", "klon_max",
          "klat_min", "klat_max")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val live = rows(graft.streaming.GeoStream.profile(
      spark.table("geo_cells")))
    val batch = rows(SparkEntry.queries("q71_geo_cells")(spark, sf))
    assert(live == batch,
      s"live cell profile != batch q71 (diff: ${(live -- batch).take(3)}" +
        s" / ${(batch -- live).take(3)})")
    // non-vacuous: multi-point cells must exist, or extrema == point
    assert(live.exists(_._2 > 1L), "fixture vacuous: no multi-point cell")
  }

  test("streaming record linkage: union of micro-batches == batch dd21") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // dd21's exact fixtures: the base from customer, the aliases
    // streamed in 3 micro-batches through LinkStream's foreachBatch
    // body; the collected union must equal the hash-gated batch frame
    val sf = "/root/testdata/sf0.001"
    val base = Tables.customer(spark, sf)
      .select(col("c_custkey"))
      .withColumn("name", expr("substr(md5('name:' || c_custkey), 1, 16)"))
    val aliasRows = SparkEntry.queries("dd21_record_linkage")(spark, sf)
      // rebuild the alias frame the query derives, straight from base
      .select("alias_id").distinct().collect().map(_.getLong(0))
    val aliases = base.filter(col("c_custkey") % 20 === 3)
      .withColumn("alias", expr(graft.queries.Dedup.linkageAliasCase))
      .select(col("c_custkey").as("alias_id"), col("alias"))
      .as[(Long, String)].collect().toSeq
    assert(aliases.map(_._1).toSet == aliasRows.toSet, "fixture drift")
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set.empty[(Long, Long, Int)]
    val q = mem.toDS().toDF("alias_id", "alias")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= graft.streaming.LinkStream.linkBatch(base, batch)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        }
        ()
      }.start()
    aliases.grouped((aliases.size + 2) / 3).foreach { c =>
      mem.addData(c: _*); q.processAllAvailable()
    }
    q.stop()
    val batchOut = SparkEntry.queries("dd21_record_linkage")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.toSet == batchOut,
      s"streamed links != batch dd21 (diff: ${(got.toSet -- batchOut).take(3)}" +
        s" / ${(batchOut -- got).take(3)})")
  }

}
