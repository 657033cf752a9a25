package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** Semantics of the round-5 temporal/analytics queries (q43-q46): the
  * sign-reversed-µs forward-as-of primitive they share, plus the
  * invariants each query's shape guarantees (funnel monotonicity,
  * cohort-day-zero completeness, never-null interpolation).
  */
class TemporalQuerySpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)

  test("sign-reversed time turns as-of into earliest-at-or-after") {
    import spark.implicits._
    // timestamp_micros(-unix_micros(t)) is a strictly order-reversing
    // bijection, so AsofJoin (latest at-or-before) over reversed times
    // must return the earliest right row at-or-after each left time —
    // the forward bracket q44/q46 are built on.
    val rev = (c: String) => expr(s"timestamp_micros(-unix_micros($c))")
    val left = Seq((1L, ts(100), "mid"), (1L, ts(120), "hit"),
      (1L, ts(500), "tail"), (2L, ts(0), "first"))
      .toDF("k", "t", "tag").withColumn("rt", rev("t"))
    val right = Seq((1L, ts(90), 9.0), (1L, ts(120), 12.0),
      (2L, ts(40), 4.0))
      .toDF("k", "ot", "v").withColumn("rt", rev("ot"))
    val out = AsofJoin.asof(left, right, "k", "rt", "rt",
      Map("v" -> "next_v"))
      .collect().map(r => r.getString(r.fieldIndex("tag")) ->
        (if (r.isNullAt(r.fieldIndex("next_v"))) null
         else r.getDouble(r.fieldIndex("next_v")))).toMap
    assert(out("mid") == 12.0)   // earliest at-or-after t=100 is t=120
    assert(out("hit") == 12.0)   // exact hit is "at-or-after"
    assert(out("tail") == null)  // nothing after t=500
    assert(out("first") == 4.0)  // t=40 is after t=0
  }

  test("q45 funnel counts are monotone non-increasing by stage") {
    val rows = SparkEntry.queries("q45_funnel")(spark, sf)
      .orderBy("stage_idx").collect()
    assert(rows.length == 3)
    val counts = rows.map(_.getLong(2))
    assert(counts.sliding(2).forall { case Array(a, b) => a >= b },
      s"funnel widened downstream: ${counts.toSeq}")
  }

  test("q43 cohort day-zero cells cover every active user exactly once") {
    val ret = SparkEntry.queries("q43_cohort_retention")(spark, sf)
    // every user contributes exactly one (cohort, offset=0) activity row
    val dayZero = ret.filter(col("offset_days") === 0)
      .agg(sum("n_users")).head().getLong(0)
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(dayZero == users)
    assert(ret.filter(col("offset_days") < 0).isEmpty,
      "cohort day must be the user's minimum activity day")
  }

  test("q46 interpolation is never null and brackets the observations") {
    val interp = SparkEntry.queries("q46_resample_interp")(spark, sf)
      .cache()
    try {
      assert(interp.filter(col("interp_value").isNull).isEmpty)
      // same spine as q34 — one row per (user, 6h slot)
      val locf = SparkEntry.queries("q34_resample_locf")(spark, sf)
      assert(interp.count() == locf.count())
      // interpolation is a convex combination: per user it can never
      // leave the observed value envelope (LOCF tails included)
      val env = Tables.events(spark, sf).filter(col("user_id") < 8)
        .groupBy("user_id")
        .agg(min("value").as("lo"), max("value").as("hi"))
      val escaped = interp.join(env, Seq("user_id"))
        .filter(col("interp_value") < col("lo") ||
          col("interp_value") > col("hi"))
      assert(escaped.isEmpty, "interp left the per-user value envelope")
    } finally interp.unpersist()
  }

  test("q51 time-weighted average stays inside the group value envelope") {
    val twa = SparkEntry.queries("q51_time_weighted_avg")(spark, sf)
    // numer = Σ v·dt over hold intervals that exactly tile [first, last],
    // so numer/span is a convex combination of the observed milli-values:
    // vmin·span ≤ numer ≤ vmax·span, with equality only for constant
    // groups. Recomputed bounds, not the query's own intermediates.
    val bounds = Tables.events(spark, sf)
      .select(col("user_id"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        expr("CAST(floor(value * 1000) AS BIGINT)").as("v"))
      .groupBy("user_id", "day")
      .agg(min("v").as("vmin"), max("v").as("vmax"))
    val joined = twa.join(bounds, Seq("user_id", "day"))
    assert(joined.count() == twa.count(), "every group must re-resolve")
    val outside = joined.filter(
      col("numer_milli_us") < col("vmin") * col("span_us") ||
        col("numer_milli_us") > col("vmax") * col("span_us"))
    assert(outside.isEmpty, "twa left the value envelope")
    // single-observation groups (span undefined) are excluded, 2+ kept.
    // A 2-point group whose points share one µs would legally emit span
    // 0 (numer 0 with it); the driver corpora contain none, so a span-0
    // row here would mean the span arithmetic broke, not the data.
    assert(twa.filter(col("n_pts") < 2).isEmpty)
    assert(twa.filter(col("span_us") <= 0).isEmpty)
  }

  test("q53 bitmask window distinct == exact set-buffering recompute") {
    // the bitmask fold must equal the memory-hungry form it replaces:
    // size(collect_set) over the identical RANGE frame
    import org.apache.spark.sql.expressions.Window
    val got = SparkEntry.queries("q53_window_distinct_types")(spark, sf)
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    val exact = Tables.events(spark, sf)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns DIV 1000").as("us"), col("event_type"))
      .select(col("user_id"), col("event_id"), col("us"),
        size(collect_set("event_type").over(w)).cast("long")
          .as("n_types_1h"))
    assert(got.exceptAll(exact).isEmpty && exact.exceptAll(got).isEmpty,
      "bitmask window distinct diverged from the exact set form")
  }

  test("g9 central difference is exact on a linear integer-time series") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // v = 2·t on an irregular INTEGER time grid: every quantity in
    // (v₊−v₋)/(t₊−t₋) is an exactly-representable double, so the
    // derivative must be exactly 2.0 — no tolerance
    val w = Window.partitionBy("k").orderBy("t")
    val ser = Seq((1L, 0.0), (1L, 7.0), (1L, 13.0), (1L, 40.0),
      (1L, 41.0)).map { case (k, t) => (k, t, 2.0 * t) }
      .toDF("k", "t", "v")
    val dv = ser
      .withColumn("tp", lag("t", 1).over(w))
      .withColumn("vp", lag("v", 1).over(w))
      .withColumn("tn", lead("t", 1).over(w))
      .withColumn("vn", lead("v", 1).over(w))
      .filter(col("tp").isNotNull && col("tn").isNotNull)
      .select(((col("vn") - col("vp")) / (col("tn") - col("tp"))).as("d"))
      .collect().map(_.getDouble(0))
    assert(dv.length == 3 && dv.forall(_ == 2.0))
    // and the gated query emits one interior row per series point pair
    val g9 = SparkEntry.queries("g9_time_derivative")(spark, sf)
    val perType = g9.groupBy("event_type").count()
    val buckets = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        (floor(unix_timestamp(col("ts")) / 600) * 600).as("t"))
      .agg(count(lit(1))).groupBy("event_type").count()
      .withColumnRenamed("count", "n_buckets")
    val bad = perType.join(buckets, "event_type")
      .filter(col("count") =!= col("n_buckets") - 2)
    assert(bad.isEmpty, "interior-point count != buckets − 2")
  }

  test("q52 transition matrix conserves events and orders time forward") {
    val m = SparkEntry.queries("q52_event_transitions")(spark, sf).cache()
    try {
      // each user with k events contributes exactly k−1 adjacent steps:
      // Σ n_transitions == |events| − |users|
      val ev = Tables.events(spark, sf)
      val nEvents = ev.count()
      val nUsers = ev.select("user_id").distinct().count()
      val total = m.agg(sum("n_transitions")).first().getLong(0)
      assert(total == nEvents - nUsers)
      // time runs forward along the (us, event_id) order, so every
      // cell's summed gap is non-negative
      assert(m.filter(col("total_gap_us") < 0).isEmpty)
      // cell labels come from the live type vocabulary
      val types = ev.select("event_type").distinct()
        .collect().map(_.getString(0)).toSet
      val cellTypes = m.select("from_type").collect().map(_.getString(0)) ++
        m.select("to_type").collect().map(_.getString(0))
      assert(cellTypes.toSet.subsetOf(types))
    } finally m.unpersist()
  }

  test("q56 SCD2: one shuffle, one current row per user, seamless tiling") {
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q56_scd2_history")(spark, sf)
    // both window passes must reuse one user_id Exchange — a second
    // shuffle would mean the change-filter broke the partitioning
    val exchanges = "(?m)^.*Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(exchanges == 1, s"expected 1 Exchange, saw $exchanges")
    val rows = df.collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, vs) =>
      // exactly one open (current) version
      assert(vs.count(_.getBoolean(4)) == 1, s"user $u current-row count")
      // history tiles seamlessly: each closed version ends exactly where
      // the next opens, and consecutive versions really changed type
      val sorted = vs.sortBy(_.getLong(2))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) == b.getLong(2), s"user $u gap in history")
          assert(a.getString(1) != b.getString(1),
            s"user $u adjacent versions share a type — collapse failed")
        case _ => ()
      }
    }
    // version count law: |rows| == |users| + |type changes|
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts_ns DIV 1000").as("us"),
        col("event_id"), col("event_type")).collect()
      .groupBy(_.getLong(0))
    val wantVersions = ev.map { case (_, es) =>
      val types = es.sortBy(e => (e.getLong(1), e.getLong(2)))
        .map(_.getString(3))
      1 + types.sliding(2).count {
        case Array(a, b) => a != b
        case _ => false
      }
    }.sum
    assert(rows.length == wantVersions)
  }

  test("q77 PIT join survives same-microsecond state changes") {
    import spark.implicits._
    // the adversarial shape the driver fixtures never produce: several
    // state CHANGES inside one µs (empty [t, t) versions), where the
    // as-of carry and the half-open-interval semantics could disagree
    // if the empty-version filter were wrong. 40 users × 30 events over
    // only 6 distinct µs instants — duplicate (user, us) guaranteed.
    val dir = java.nio.file.Files.createTempDirectory("pit-ev").toString
    val rnd = new scala.util.Random(77)
    val types = Array("view", "purchase", "click", "error")
    val rows = for { u <- 0 until 40; i <- 0 until 30 } yield (
      (u * 30 + i).toLong,
      (rnd.nextInt(6).toLong * 1000000L + 500L) * 1000L, // nanos
      u.toLong, types(rnd.nextInt(4)), 1.0)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    // first-principles truth: walk each user's (us, event_id)-ordered
    // events; the state at a fact's us is the type of the LAST change
    // point with from <= us — later changes in the same µs overwrite,
    // which is exactly "skip empty versions"
    val evs = rows.map(r => (r._3, r._2 / 1000L, r._1, r._4))
    val byUser = evs.groupBy(_._1)
    def stateAt(u: Long, us: Long): String = {
      var state: String = null
      var cur: String = null
      for ((_, eus, _, t) <- byUser(u).sortBy(e => (e._2, e._3)))
        if (cur == null || cur != t) { cur = t; if (eus <= us) state = t }
      state
    }
    val expected = evs.filter(_._4 == "purchase")
      .map { case (u, us, eid, _) => (eid, u, us, stateAt(u, us)) }.toSet
    val got = SparkEntry.queries("q77_scd2_pit_join")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == expected,
      s"PIT diverges on same-µs changes (diff: ${(got -- expected).take(3)}" +
        s" / ${(expected -- got).take(3)})")
    // the shape is genuinely adversarial: some user really has >1
    // distinct state change within one µs instant
    val multi = byUser.values.exists { es =>
      es.groupBy(_._2).values.exists { sameUs =>
        sameUs.sortBy(e => (e._2, e._3)).map(_._4)
          .sliding(2).count { case Seq(a, b) => a != b; case _ => false } >= 2
      }
    }
    assert(multi, "fixture vacuous: no multi-change µs instant")
    graft.util.Fs.rmTree(new java.io.File(dir))
  }
}
