package graft

import org.apache.spark.sql.functions._

import graft.operators.BucketCap

/** Physical-plan shape and adversarial-input guarantees for the bucketed
  * candidate-generation queries:
  *   - dd7 (semantic near-dup) must not plan a nested-loop/cartesian pair
  *     scan — that was the quadratic scale-killer its SRP rewrite removed;
  *   - s4's nearest-centroid assignment must be a hash aggregation (map-side
  *     combinable), not a window sort over the N×C similarity rows;
  *   - BucketCap bounds the pair explosion of a pathological bucket (a
  *     flood of identical members) while leaving organic buckets intact.
  */
class PlanShapeSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  // ANN tier queries memoize their 10-row shortlist (Similarity.memoTier),
  // so SparkEntry.queries returns a LocalRelation on a memo hit — plan
  // pins for the tiers must read the RAW pipeline builders instead.
  private def tierPlan(name: String): String =
    graft.queries.Similarity.tierBuilders(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("events ts range predicate reaches the parquet scan (PushedFilters)") {
    // eventsTsBetween dispatches on the physical encoding: µs-native data
    // filters the public ts (cast-unwrap restores pushdown through the
    // NTZ→LTZ cast); nanos-encoded data filters the NATIVE ts_ns long,
    // which Catalyst pushes through the rename back onto the raw `ts`
    // column. Both spellings surface in PushedFilters as bounds on `ts`,
    // so this asserts pushdown under WHICHEVER encoding the driver shipped.
    val ev = Tables.events(spark, sf) // sets nanosAsLong before the probe read
    val scan = ev
      .filter(Tables.eventsTsBetween(ev, 0L, 4102444800000000L))
      .queryExecution.executedPlan.toString
    val pushed = scan.linesIterator.find(_.contains("PushedFilters"))
      .getOrElse(scan)
    assert(pushed.contains("GreaterThanOrEqual(ts") &&
      pushed.contains("LessThanOrEqual(ts"),
      s"ts bound not pushed to parquet:\n$pushed")
  }

  test("nanos ts bounds are exact at negative and boundary timestamps") {
    // the ns bracket for a µs bound must follow the truncate-toward-zero
    // rounding BOTH engines apply (Spark DIV, DuckDB //): µs 0 covers
    // ns [-999, 999], not [0, 999]. A synthetic nanos-encoded events
    // table with pre-epoch rows pins the equivalence the driver's
    // 2024-era fixtures cannot reach.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nanos-ev").toString
    // includes the two extreme representable ts_ns values: the exact-
    // saturation and empty-bracket cases live there (trunc-µs of
    // Long.MaxValue is 9223372036854775 — a µs bound one past it must
    // match NOTHING, not the extreme row)
    val ns = Seq(Long.MinValue, -2500L, -2000L, -1500L, -1000L, -999L,
      -500L, -1L, 0L, 1L, 500L, 999L, 1000L, 1500L, 2000L, 2500L,
      Long.MaxValue - 999L, Long.MaxValue)
    ns.zipWithIndex.map { case (n, i) =>
        (i.toLong, n, i.toLong % 3, "click", 1.0)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts_ns").dataType ==
      org.apache.spark.sql.types.LongType)
    def micros(n: Long): Long = n / 1000L // JVM / truncates toward zero
    val maxUs = Long.MaxValue / 1000
    val minUs = Long.MinValue / 1000
    for ((a, b) <- Seq((-2L, -1L), (-1L, 0L), (0L, 0L), (0L, 1L),
        (-2L, 2L), (1L, 2L), (Long.MinValue, Long.MaxValue),
        // exact saturation: the extreme achievable µs bounds must keep
        // their brackets (not over-saturate and drop the tail rows)
        (maxUs, Long.MaxValue), (Long.MinValue, minUs),
        // empty brackets: bounds one past the achievable µs range must
        // match NOTHING (not admit the single extreme ts_ns row)
        (maxUs + 1, Long.MaxValue), (Long.MinValue, minUs - 1),
        (5L, 2L))) {
      val got = ev.filter(Tables.eventsTsBetween(ev, a, b))
        .select("ts_ns").collect().map(_.getLong(0)).sorted.toSeq
      val want = ns.filter(n => micros(n) >= a && micros(n) <= b).sorted
      assert(got == want, s"[$a,$b]µs: got $got want $want")
      val gotLt = ev.filter(Tables.eventsTsBefore(ev, b))
        .select("ts_ns").collect().map(_.getLong(0)).sorted.toSeq
      val wantLt = ns.filter(n => micros(n) < b).sorted
      assert(gotLt == wantLt, s"<$b µs: got $gotLt want $wantLt")
    }
    graft.util.Fs.rmTree(new java.io.File(dir))
  }

  test("round-7 query plans: broadcast pass-2, single-shuffle windows") {
    // t25: the candidate set joins back as a BROADCAST hash join (≤ m
    // driver-bounded keys) — a shuffled join here would defeat the whole
    // two-pass design
    val t25 = plan("t25_hot_ngrams")
    assert(t25.contains("BroadcastHashJoin"), s"t25 pass-2 not broadcast:\n$t25")
    assert(!t25.contains("BroadcastNestedLoopJoin") &&
      !t25.contains("CartesianProduct"), "t25 has a nested-loop join")
    // p14: BOTH windows (running sum + per-lang total) ride ONE lang
    // Exchange — a second shuffle would mean the shared-partitioning
    // design regressed
    val p14 = plan("p14_language_quota")
    val p14Ex = "Exchange hashpartitioning".r.findAllIn(p14).size
    assert(p14Ex == 1, s"p14 expected 1 window Exchange, got $p14Ex:\n$p14")
    // q62: the fold is one user_id Exchange into MapGroups — nothing else
    val q62 = plan("q62_ewma")
    val q62Ex = "Exchange hashpartitioning".r.findAllIn(q62).size
    assert(q62Ex == 1 && q62.contains("MapGroups"),
      s"q62 expected 1 Exchange + MapGroups:\n$q62")
    // t26: gram-keyed equi joins only
    val t26 = plan("t26_ngram_novelty")
    assert(!t26.contains("BroadcastNestedLoopJoin") &&
      !t26.contains("CartesianProduct"), "t26 has a nested-loop join")
    // g11: exactly TWO Exchanges by design — the corpus bucket agg
    // shuffles on (type, bucket) with full key parallelism, and the
    // per-type window + roll-up share one type-only re-shuffle of the
    // bounded bucket frame. One Exchange would mean the corpus agg got
    // pre-partitioned on |types| keys (a parallelism cap at 100 TB);
    // three would mean the window and the roll-up stopped sharing.
    val g11 = plan("g11_column_integral")
    val g11Ex = "Exchange hashpartitioning".r.findAllIn(g11).size
    assert(g11Ex == 2, s"g11 expected 2 Exchanges, got $g11Ex:\n$g11")
  }

  test("round-9 session-2 plans: scan-local redaction, one-Exchange media") {
    // t33: construction + three regexp_replace stages + three
    // regexp_count probes all run in-row at the scan; the ONLY Exchange
    // is the final per-lang aggregate (7 columns × |langs| rows). A
    // second Exchange would mean the redaction pipeline started
    // shuffling text.
    val t33 = plan("t33_pii_redact")
    val t33Ex = "Exchange hashpartitioning".r.findAllIn(t33).size
    assert(t33Ex == 1, s"t33 expected 1 Exchange, got $t33Ex:\n$t33")
    // mm13: ONE media_id Exchange serves the lag window, the running
    // cut-sum, and both aggregation levels (mm8's subset-rule pattern)
    val mm13 = plan("mm13_shot_segments")
    val mm13Ex = "Exchange hashpartitioning".r.findAllIn(mm13).size
    assert(mm13Ex == 1, s"mm13 expected 1 Exchange, got $mm13Ex:\n$mm13")
    // p21: one map-side-combined QI aggregate, nothing else
    val p21 = plan("p21_k_anonymity")
    val p21Ex = "Exchange hashpartitioning".r.findAllIn(p21).size
    assert(p21Ex == 1, s"p21 expected 1 Exchange, got $p21Ex:\n$p21")
    // mm12: decode-narrow scan into one 4-key aggregate; the trailing
    // stats columns are projections over the agg, not new shuffles
    val mm12 = plan("mm12_aspect_buckets")
    val mm12Ex = "Exchange hashpartitioning".r.findAllIn(mm12).size
    assert(mm12Ex == 1, s"mm12 expected 1 Exchange, got $mm12Ex:\n$mm12")
  }

  test("round-9 session-3 plans: one-Exchange geo cells, local radius") {
    // q71: quantize + interleave run in-row at the scan; the ONLY
    // Exchange is the per-cell occupancy aggregate (bounded by the
    // 2^16 cell domain). A second Exchange would mean the coordinate
    // derivation itself started shuffling.
    val q71 = plan("q71_geo_cells")
    val q71Ex = "Exchange hashpartitioning".r.findAllIn(q71).size
    assert(q71Ex == 1, s"q71 expected 1 Exchange, got $q71Ex:\n$q71")
    // q72: bbox prefilter + haversine are row-local; top-20 resolves
    // via TakeOrderedAndProject (per-partition heaps + driver merge),
    // never a global sort Exchange
    val q72 = plan("q72_geo_radius")
    assert(q72.contains("TakeOrderedAndProject"),
      s"q72 expected TakeOrderedAndProject:\n$q72")
    assert(!q72.contains("Exchange rangepartitioning"),
      s"q72 must not globally sort:\n$q72")
    // p22: one |langs|-bounded aggregate; the noise transform is a
    // projection over the agg, never a second shuffle
    val p22 = plan("p22_dp_release")
    val p22Ex = "Exchange hashpartitioning".r.findAllIn(p22).size
    assert(p22Ex == 1, s"p22 expected 1 Exchange, got $p22Ex:\n$p22")
  }

  test("q73 geo join broadcasts the probe side; the point table never shuffles") {
    // the cell-key equijoin must be a BroadcastHashJoin on the exploded
    // (probes × 9)-row side — zero shuffle Exchanges anywhere: at 100 TB
    // the point table is the side that must not move
    val p = plan("q73_geo_join")
    assert(p.contains("BroadcastHashJoin"), s"q73 expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"q73 wrong join strategy:\n$p")
    val ex = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(ex == 0, s"q73 expected 0 shuffle Exchanges, got $ex:\n$p")
  }

  test("q74 autocorr: one Exchange, one Window, generate after the agg") {
    // all three lags come out of ONE window pass; the aggregate inherits
    // the window's hashpartitioning(user_id) (no second shuffle); the
    // per-lag unpivot (Generate/inline) sits ABOVE the aggregate, so it
    // multiplies O(series) rows, never the corpus
    val p = plan("q74_autocorr")
    val ex = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(ex == 1, s"q74 expected 1 Exchange, got $ex:\n$p")
    val wins = "\\bWindow \\[".r.findAllIn(p).size
    assert(wins == 1, s"q74 expected 1 Window, got $wins:\n$p")
    val genIdx = p.indexOf("Generate")
    val aggIdx = p.indexOf("HashAggregate")
    assert(genIdx >= 0 && aggIdx > genIdx,
      s"q74 expected Generate above the aggregate:\n$p")
  }

  test("dd21 linkage broadcasts the alias segments; no nested-loop pair scan") {
    // candidates come from the pigeonhole segment equijoin with the
    // query-sized alias side broadcast — the base table must never
    // shuffle for candidate generation (the only Exchange is the
    // candidate-pair dedup) and there must be no quadratic join
    val p = plan("dd21_record_linkage")
    assert(p.contains("BroadcastHashJoin"), s"dd21 expected broadcast join:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin") && !p.contains("SortMergeJoin"),
      s"dd21 wrong join strategy:\n$p")
    val ex = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(ex == 1, s"dd21 expected 1 Exchange (pair dedup), got $ex:\n$p")
  }

  test("q76 integrity audit: every leg broadcasts its parent key set") {
    // four left-outer joins against degraded dim snapshots — each must
    // broadcast the parent side (the fact side never shuffles for the
    // audit); orphanhood folds in the same aggregate as the child count
    val p = plan("q76_fk_orphans")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj == 4, s"q76 expected 4 broadcast joins, got $bhj:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"q76 must not shuffle a fact side:\n$p")
  }

  test("p23 pareto frontier: both window maxima share one Exchange and Sort") {
    // m_lt (RANGE …, -1) and m_eq (RANGE current..current) partition and
    // order identically, so Catalyst plans a single Exchange + Sort and
    // one Window node carrying both frames — a second Exchange or Sort
    // would mean the frames diverged
    val p = plan("p23_pareto_frontier")
    val ex = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(ex == 1, s"p23 expected 1 Exchange, got $ex:\n$p")
    val sorts = "\\bSort \\[".r.findAllIn(p).size
    assert(sorts == 1, s"p23 expected 1 Sort, got $sorts:\n$p")
  }

  test("dd7 plan has no nested-loop or cartesian join") {
    val p = plan("dd7_embed_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.linesIterator.take(5).mkString("\n"))
    assert(!p.contains("CartesianProduct"))
  }

  test("s17/dd17/mm8 plans: broadcast probe, equi-joins only, one Exchange") {
    // NOTE both s17 and dd17 embed ivfAssign's cached build, whose
    // broadcast N×C assignment fan-out IS a BroadcastNestedLoopJoin by
    // design (C = cell count, broadcast side — the pattern s4's own plan
    // test documents), so a blanket no-BNLJ assert would be wrong here;
    // the quadratic killer to pin against is an unbroadcast cartesian.
    // s17: the nprobe cell list joins back as a BROADCAST hash join (2
    // driver-bounded rows) — a shuffled probe join would defeat the IVF
    // design
    val s17 = tierPlan("s17_ivfpq_knn")
    assert(s17.contains("BroadcastHashJoin"), s"s17 probe not broadcast:\n$s17")
    assert(!s17.contains("CartesianProduct"), "s17 has a cartesian join")
    // dd17: the intra-cell pair join is an EQUI join on cent_id — a
    // cartesian here would be the corpus² SemDeDup explicitly avoids
    val dd17 = plan("dd17_semdedup")
    assert(!dd17.contains("CartesianProduct"), "dd17 has a cartesian join")
    // mm8: ONE media_id Exchange serves the island window and both
    // aggregation levels (hash-partitioning on media_id satisfies the
    // (media_id, isl) clustering — subset rule); a second Exchange means
    // the single-pass design regressed to the join-of-branches shape
    val mm8 = plan("mm8_audio_vad")
    val mm8Ex = "Exchange hashpartitioning".r.findAllIn(mm8).size
    assert(mm8Ex == 1, s"mm8 expected 1 Exchange, got $mm8Ex:\n$mm8")
  }

  test("p8 composition stays shuffle-bounded: no BNLJ, bounded Exchanges") {
    // the full-pipeline composition must not quietly multiply shuffles:
    // its stages are scan-local filters, doc_id/token-keyed aggs, and
    // broadcast joins (eval shingles, lang stats). The Exchange bound is
    // a tripwire — a regression that re-shuffles the corpus per stage
    // (e.g. losing a broadcast) blows past it
    val p = plan("p8_full_pipeline")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
    // count DISTINCT exchanges by plan_id: the persist barriers make
    // InMemoryRelation subtrees print once per reference, so a raw line
    // count would multiply every upstream Exchange by its reader count.
    // 13 = one per logical stage in the STATIC plan (AQE converts the
    // small-side SMJ exchanges to broadcasts at runtime); the bound is a
    // tripwire for a stage-recomputation regression, which adds 2+
    val idRe = "\\[plan_id=(\\d+)\\]".r
    def distinctExchanges(pred: String => Boolean): Set[String] = p
      .linesIterator
      .filter(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
      .filter(pred)
      .flatMap(l => idRe.findFirstMatchIn(l).map(_.group(1)))
      .toSet
    val all = distinctExchanges(_ => true)
    // non-empty first: if a Spark upgrade stops printing [plan_id=N] on
    // Exchange lines, the extraction yields an empty set and the bound
    // below would pass vacuously — fail loudly on format drift instead
    assert(all.nonEmpty, "no [plan_id=N]-tagged Exchange lines found — " +
      "the plan print format changed; update the extraction")
    // 19 distinct ids in the current static plan: 13 stage exchanges +
    // 2 added by canChangeCachedPlanOutputPartitioning=true (an explicit
    // re-partition above cached reads instead of trusting the cache's
    // layout — AQE elides/coalesces those at runtime) + 4 from the r14
    // kernel-parallelism spread (the quality scan is spread before the
    // per-doc kernels; the RoundRobin exchange gets a distinct id per
    // instantiated branch of the rep self-join — deliberate: without it
    // the single-row-group driver parquet runs every kernel on one
    // core). 20 leaves one id of headroom for print-format jitter while
    // still firing on a stage recomputation, which adds 2+ (measured:
    // removing one barrier → +3)
    assert(all.size <= 20,
      s"p8 plans ${all.size} distinct non-broadcast Exchanges:\n" +
        p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    // the barriers themselves: the plan must reference ≥3 DISTINCT
    // cached relations — rep, deduped, and resultThenRelease's result
    // cache. (result alone would make a bare contains() check vacuous:
    // the persisted result frame always renders one InMemoryRelation.)
    // toString prints `InMemoryRelation [cols...], StorageLevel(...)`;
    // a re-referenced cache can reprint with fresh expression ids, so
    // dedupe by the id-stripped column signature, not the raw text
    val imrSigs = "InMemoryRelation \\[([^\\]]*)\\]".r
      .findAllMatchIn(p)
      .map(_.group(1).replaceAll("#\\d+L?", ""))
      .toSet
    assert(imrSigs.size >= 3,
      s"expected ≥3 distinct cached relations (rep, deduped, result), " +
        s"saw ${imrSigs.size}: ${imrSigs.mkString(" | ")} — a p8 " +
        "materialization barrier is gone")
  }

  test("dd7: exact precision, measured recall vs the exact pair set") {
    import graft.functions.VectorFunctions.cosine
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val a = e.alias("a"); val b = e.alias("b")
    val exact = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        cosine(col("a.embedding"), col("b.embedding")).as("cs"))
      .filter(col("cs") >= 0.4)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("dd7_embed_neardup")(spark, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision is exact: the cosine re-rank admits only true pairs
    assert((got -- exact).isEmpty, s"false positives: ${got -- exact}")
    // recall is probabilistic: multiprobe (1-bit-flip neighbors) over
    // 8 tables × 4-bit bands gives each pair ≈0.998 candidate probability
    // even at the cos-0.4 threshold floor; assert a floor that a
    // single-probe regression (≈0.75) or broken banding would breach
    val recall = (got intersect exact).size.toDouble / exact.size
    assert(recall >= 0.85, s"recall $recall (${got.size}/${exact.size})")
  }

  test("s4 assignment aggregates instead of window-sorting N×C rows") {
    val p = tierPlan("s4_ivf_knn")
    assert(!p.contains("Window"), "nearest-centroid should be max_by, not row_number")
    assert(p.contains("Aggregate"), "expected partial/final aggregation")
  }

  test("TopKPerKey is exact: matches the all-shuffle window formulation") {
    import graft.operators.TopKPerKey
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // heavy ties plus the Spark-ordering edge cases: NaN (ranks FIRST
    // under DESC) and signed zeros (-0.0 == 0.0, tie decides)
    val df = ((0L until 2000L)
      .map(i => (i % 7, rnd.nextInt(50) / 10.0, i)) ++
      Seq((0L, Double.NaN, 9001L), (1L, Double.NaN, 9002L),
        (2L, -0.0, 9003L), (2L, 0.0, 9004L)))
      .toDF("k", "score", "id")
      .repartition(5)
    // compare score bit patterns: NaN != NaN would make tuple-set
    // equality fail on results that are in fact identical
    def canon(r: org.apache.spark.sql.Row) =
      (r.getLong(0), java.lang.Double.doubleToLongBits(r.getDouble(1)), r.getLong(2))
    val got = TopKPerKey.topK(df, "k", "score", "id", k = 4)
      .collect().map(canon).toSet
    val w = Window.partitionBy("k").orderBy(col("score").desc, col("id"))
    val ref = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      .drop("rn")
      .collect().map(canon).toSet
    assert(got == ref)
  }

  test("repartitionBySize derives the partition count from plan statistics") {
    val df = Tables.documents(spark, sf)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(bytes > 0)
    val target = (bytes / BigInt(7)).toLong.max(1L)
    val expected = ((bytes + target - 1) / target).toInt
    assert(Tables.repartitionBySize(df, target).rdd.getNumPartitions
      == expected)
    // a frame smaller than the target still gets one partition, never zero
    assert(Tables.repartitionBySize(df, Long.MaxValue)
      .rdd.getNumPartitions == 1)
  }

  test("TopKPerKey rejects binary keys, including binary nested in a struct") {
    import graft.operators.TopKPerKey
    import spark.implicits._
    val flat = Seq((Array[Byte](1), 1.0, 1L)).toDF("k", "score", "id")
    intercept[IllegalArgumentException] {
      TopKPerKey.topK(flat, "k", "score", "id", k = 1)
    }
    // Array[Byte] inside a struct key splits HashMap groups just the same
    // (Row.hashCode on a binary element is identity-based)
    val nested = Seq((Array[Byte](1), 1.0, 1L)).toDF("kb", "score", "id")
      .select(struct(col("kb")).as("k"), col("score"), col("id"))
    intercept[IllegalArgumentException] {
      TopKPerKey.topK(nested, "k", "score", "id", k = 1)
    }
  }

  test("bucket cap drops a pathological flood but keeps organic buckets") {
    import spark.implicits._
    // 1000 members hash to one bucket (a boilerplate flood) + two organic
    // buckets; capped candidate generation must not touch the flood
    val rows = (0 until 1000).map(i => (i.toLong, "hot")) ++
      Seq((2000L, "a"), (2001L, "a"), (3000L, "b"), (3001L, "b"))
    val keyed = rows.toDF("doc_id", "bk")
    val capped = BucketCap.capBuckets(keyed, Seq("bk"), cap = 100)
    assert(capped.filter(col("bk") === "hot").count() == 0)
    val a = capped.alias("a"); val b = capped.alias("b")
    val pairs = a.join(b, col("a.bk") === col("b.bk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).collect()
    // without the cap this join would emit 1000·999/2 ≈ 5·10⁵ flood pairs
    assert(pairs.length == 2)
  }

  test("connected components match a union-find reference on random graphs") {
    import graft.operators.ConnectedComponents
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(50)((rnd.nextInt(n), rnd.nextInt(n)))
        .filter(e => e._1 != e._2)
        .map { case (a, b) => (a.toLong, b.toLong) }
      // in-memory union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(ra) = rb
      }
      val minOfComp = (0 until n).groupBy(find).map { case (r, ms) => r -> ms.min }
      val got = ConnectedComponents.components(
          edges.toDF("src", "dst"), "src", "dst", maxIter = 64)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got.foreach { case (node, label) =>
        assert(label == minOfComp(find(node.toInt)).toLong,
          s"node $node labeled $label, expected ${minOfComp(find(node.toInt))}")
      }
      // every node that touches an edge is labeled
      assert(got.keySet == edges.flatMap(e => Seq(e._1, e._2)).toSet)
    }
  }

  test("connected components: transitive chains collapse to one label") {
    import graft.operators.ConnectedComponents
    import spark.implicits._
    // path 1-2-3-4 (diameter 3 — needs >1 propagation round), pair 10-11,
    // and a cross edge 4-10 merging both into one component at the end
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (4L, 10L))
      .toDF("src", "dst")
    val got = ConnectedComponents.components(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 1L, 11L -> 1L))
    // two separate components keep separate min labels
    val two = ConnectedComponents.components(
      Seq((5L, 6L), (8L, 7L)).toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == Map(5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L))
  }

  test("bucket cap is replay-consistent: kept buckets are untouched") {
    import spark.implicits._
    val keyed = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "bk")
    val capped = BucketCap.capBuckets(keyed, Seq("bk"), cap = 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(capped == Set((1L, "x"), (2L, "x"), (3L, "y")))
  }

  test("runtime bloom filter injects on the selective-dim fact join") {
    // The third leg of join-derived pruning, beside broadcast (q4) and
    // AQE skew handling (PLANS.md q25 section): when the dim side is too
    // big to broadcast but carries a selective predicate, Spark's
    // InjectRuntimeFilter builds a bloom filter over the dim's surviving
    // join keys and applies it to the FACT SCAN — fact rows that cannot
    // match die before the shuffle, which is where a 100 TB join spends
    // its time. The injection thresholds are sized for production
    // (application side > 10 GB) so the fixture needs them scaled; at
    // target scale the defaults fire on exactly this shape unaided.
    val dir = "/root/testdata/sf0.01"
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    def shape() = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val opt = shape().queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
        s"expected an injected runtime bloom filter, got:\n${opt.take(2000)}")
      val filtered = shape().collect().toSeq
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = shape()
      assert(!plain.queryExecution.optimizedPlan.toString.contains("might_contain"))
      // bloom pre-filtering is advisory (false positives only) — the join
      // result must be bit-identical with and without it
      assert(filtered == plain.collect().toSeq)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
