package graft

import org.apache.spark.sql.functions._

import graft.api.GridFields
import graft.source.{GridFixtures, GridReader}

/** Partition/row-order invariance (SURVEY §5 plan #2 / §7.4 risk 1-2): the
  * reference's positional time-stamping and sorted-MultiIndex reshape are
  * order-fragile; the engine's provenance time + explicit-sort pivot must
  * give identical results under any partitioning or input order.
  */
class InvarianceSpec extends SparkSuite {

  private lazy val dir = GridFixtures.ensure(spark, "invariance", n = 5)

  test("GridFields identical under repartition and row shuffle") {
    val df = new GridReader(spark, dir)
      .fetch(GridFixtures.t0, GridFixtures.t0.plusSeconds(5 * 600),
        250000.0, 400000.0)
    val base = GridFields.fromDataFrame(df)
    val variants = Seq(
      df.repartition(17),
      df.repartition(3, col("lat")),
      df.orderBy(rand(42)))
    val p = Array(GridFixtures.t0.getEpochSecond + 700.0, 123.0, -33.0, 317000.0)
    variants.foreach { v =>
      val kd = GridFields.fromDataFrame(v)
      assert(kd.grid("T").axes.map(_.toSeq).toSeq ==
        base.grid("T").axes.map(_.toSeq).toSeq)
      assert(kd.grid("T").values.sameElements(base.grid("T").values))
      assert(kd.eval("rho", p) == base.eval("rho", p))
    }
  }

  test("oracled queries invariant to shuffle partition count") {
    val sf = "/root/testdata/sf0.001"
    // q44/q46 join the round-5 trio: the double-as-of queries lean on
    // window-carry ordering inside AsofJoin, exactly the machinery a
    // partitioning bug would corrupt silently
    // q51 (lead-window holds) and p10 (float-keyed top-N) join the list:
    // both would corrupt silently under an ordering/partitioning bug
    // q55/s11/s10 join: integer/boolean emissions and per-row-determined
    // floats, so strict equality is the right bar
    // q59/t24 emit only integers/strings/booleans (BIGINT milli revenue);
    // s13/s14 rank on per-row dot products whose IEEE fold order is
    // row-local (partitioning cannot reorder it), so strict equality is
    // the right bar for all four round-6 queries here
    for (name <- Seq("q1_agg", "dd2_shingle_jaccard", "g1_interp_1d",
        "q44_nearest_event", "q46_resample_interp",
        "q51_time_weighted_avg", "p10_weighted_sample",
        "q55_dq_report", "s11_filtered_knn", "s10_mmr_diverse",
        "q56_scd2_history", "q57_copurchase_pairs",
        "q59_attribution", "t24_blocklist_filter",
        "s13_label_prop", "s14_hard_negatives",
        // round-7: q60 emits only integers (counts + cap); s15's arm
        // ranks fold ≤5 double terms per doc before an id-tie-broken
        // row_number — rank flips would need bm25 collisions within an
        // ulp, which the word-salad corpus does not produce
        "q60_triangle_count", "s15_hybrid_rrf",
        // round-7 additions: p14/t25 emit only integers+strings; t26's
        // novelty is one row-local division of two exact BIGINTs; s16's
        // recall is hits/10 — all strict-equality material. t25
        // additionally exercises the MG candidate path under a changed
        // partition layout (different merge trees, same final frame —
        // the completeness guarantee in action)
        "p14_language_quota", "t25_hot_ngrams",
        "t26_ngram_novelty", "s16_recall_eval",
        // q62's fold is sequential per user (sort inside the group) —
        // partitioning moves groups, never reorders within one; p15's
        // bit_xor signature is commutative BY DESIGN — this is the test
        // that catches anyone swapping it for an order-sensitive hash
        "q62_ewma", "p15_shard_manifest",
        // q63 filters q56's windowed frame (integer µs bounds); mm7's
        // min-label components are partition-order-free by construction
        "q63_time_travel", "mm7_phash_clusters",
        // round-7b: dd17/mm8 emit only integers; s17's dot/ADC folds are
        // row-local (LUT is a plan literal) with id-broken ties; q64's
        // medians are exact on integerized cents — all strict material
        "dd17_semdedup", "s17_ivfpq_knn", "mm8_audio_vad",
        "q64_rolling_median",
        // round-7c: q65/g11/p16/t27 emit integers/strings/booleans;
        // mm9's channel mean is a row-local byte fold; s18's Hamming
        // cut is integer with id ties and its cosines row-local
        "q65_event_paths", "g11_column_integral", "p16_release_diff",
        "t27_xml_roundtrip", "mm9_binary_ingest", "s18_binary_knn",
        // round-8: t28/t30 emit integers+strings (the merge argmax is
        // integer-total + binary-string ordered, partition-layout-free
        // by the map-side-combined pair agg); t29's score sums DYADIC
        // (k/1024) weights — exact doubles, order cannot move them
        "t28_bpe_train", "t29_quality_score", "t30_bpe_apply",
        // round-8 session-2: p17/p19 emit only integers/booleans/strings
        // (exact counts, min/max of longs); p18's bin counts are exact
        // longs and psi_term is computed from them row-locally, so even
        // its doubles are layout-free — only psi_total's fold order
        // could move, and it sums 20 terms from a fixed-order spine;
        // mm10's clip_sim is a row-local dot of two per-row vectors
        // (partitioning cannot reorder an in-row fold)
        "p17_column_profile", "p18_drift_psi", "p19_doc_constraints",
        "mm10_clip_filter",
        // round-9: q66/s19/mm11 emit only integers/booleans/strings
        // (denominator-cleared z-score, permille stats, md5 keys +
        // counts); dd18's est_jac is dyadic k/32 and its jac is the
        // already-invariant dd2 value; s20's cosines are row-local
        // codegen dots with id-broken ties — all strict material
        "q66_rolling_outliers", "s19_cell_stats", "s20_ivf_batch_knn",
        "dd18_sketch_error", "mm11_frame_dup_groups",
        // round-9b: q67/t32 emit integers/strings; dd19/s21 rank
        // row-local codegen dots with id ties — strict material
        "q67_group_by_all", "t32_tokenizer_fertility",
        "dd19_semantic_decontam", "s21_ivf_filtered_knn",
        // round-9 session-2: t33/mm12/mm13/q70/p20 emit only integers/
        // strings/booleans; dd20 integerizes to micros before summing;
        // q68/q69's states are integer-valued doubles + one division of
        // exact operands; g12 evaluates g1's machinery (already swept)
        // through a row-local nearest kernel — all strict material
        "t33_pii_redact", "mm12_aspect_buckets", "mm13_shot_segments",
        "dd20_lsh_planner", "q68_summary_rewrite", "q69_summary_refresh",
        "g12_interp_nearest", "q70_compact_small_files",
        "p20_stage_attrition", "p21_k_anonymity", "s22_tombstone_knn",
        // round-9 session-3: q71 is pure-integer (quantizer + morton
        // interleave + extrema); q72's distances and p22's noise are
        // row-local double transforms of integer-derived inputs —
        // identical on every partitioning — and p22's n_true is an
        // exact integer count; all strict material
        "q71_geo_cells", "q72_geo_radius", "p22_dp_release",
        // q73's pairs and q74's sufficient statistics are exact
        // (integer cells / integer sums); p23's skyline predicate is
        // pure-integer window algebra — partitioning cannot move any
        // of them
        "q73_geo_join", "q74_autocorr", "p23_pareto_frontier",
        // dd21's links and distances are pure string/integer functions
        // of the keys — strict material; q75's fit is doubles derived
        // from exact integer sums — partition-order-free
        "dd21_record_linkage", "q75_linear_fit",
        // t34 is a row-local projection — trivially strict; q76 is
        // exact integer counts over keyed joins
        "t34_readability", "q76_fk_orphans",
        // q77's carry is a deterministic per-user order — strict
        "q77_scd2_pit_join")) {
      val r1 = SparkEntry.queries(name)(spark, sf)
      val cols = r1.columns.map(col)
      val base = r1.orderBy(cols: _*).collect().map(_.toString).toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      try {
        val r2 = SparkEntry.queries(name)(spark, sf)
          .orderBy(cols: _*).collect().map(_.toString).toSeq
        assert(r2 == base, s"$name differs under 7 shuffle partitions")
      } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }

  test("aggregated-float queries: keys exact, sums within tolerance") {
    import org.apache.spark.sql.types.DoubleType
    val sf = "/root/testdata/sf0.001"
    // these aggregate doubles, so a partition-count change legitimately
    // reorders the summation — keys and integer columns must be
    // IDENTICAL, float cells must agree to the same 1e-9 the oracle
    // gate allows (anything worse means real nondeterminism, not ulps)
    // q58: per-node contribution sums reorder under partitioning — keys
    // (node) exact, ranks within the oracle's 1e-9
    for (name <- Seq("t23_lm_perplexity", "p12_dsir_weights",
        "g10_conservative_regrid", "s12_label_prototypes",
        "q58_pagerank")) {
      def run() = {
        val r = SparkEntry.queries(name)(spark, sf)
        val keys = r.schema.fields.filter(_.dataType != DoubleType)
          .map(f => col(f.name))
        (r.schema.fields.zipWithIndex, r.orderBy(keys: _*).collect())
      }
      val (fields, base) = run()
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      try {
        val (_, alt) = run()
        assert(alt.length == base.length, s"$name row count changed")
        base.zip(alt).foreach { case (a, b) =>
          fields.foreach { case (f, i) =>
            if (f.dataType == DoubleType) {
              val (x, y) = (a.getDouble(i), b.getDouble(i))
              assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)),
                s"$name.${f.name}: $x vs $y")
            } else assert(a.get(i) == b.get(i),
              s"$name.${f.name}: ${a.get(i)} vs ${b.get(i)}")
          }
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }
}
