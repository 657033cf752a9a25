package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality profiling and distribution-drift monitoring — the
  * validation stages a production corpus pipeline runs BESIDE the
  * transform queries (the Deequ / TFDV role: Schelter et al., "Automating
  * Large-Scale Data Quality Verification", VLDB 2018; PSI is the standard
  * population-stability metric of model-monitoring practice). Completes
  * the family q32 (events profile) and q55 (constraint report) started:
  *
  *   - p17 generalizes q32's one-scan profile into a reusable operator
  *     ([[columnProfile]]: any table, any column list) and adds the two
  *     metrics q32 lacks — numeric min/max and the exact↔HLL switch as a
  *     parameter rather than a separate code path. The documents-table
  *     gate means BOTH driver fact tables now have an oracled profile;
  *   - p18 quantifies distribution shift between two corpus snapshots
  *     (reference vs current) as the Population Stability Index over a
  *     fixed binning — the "did this release's length/language mix move"
  *     alarm that catches silent upstream filter changes. Profiles say
  *     what a snapshot looks like; PSI says how far two snapshots have
  *     moved apart — the monitoring half validation was missing.
  *
  * Scale design: p17 is one Aggregate over a narrow projection — the
  * exact multi-column `count(DISTINCT)` plans as one Expand(k+1 branches)
  * + two hash aggregations, still a single corpus scan; at 100 TB the
  * `exact = false` form swaps in HLL (`approx_count_distinct`, dd13's
  * mergeable-sketch scale path) and drops the Expand entirely —
  * ProfilingSpec pins the two forms agree within HLL tolerance. p18's
  * corpus cost is ONE ≤ `PsiBins`-key hash aggregation (map-side
  * combined, conditional sums for the two snapshots in the same pass);
  * everything after is arithmetic on a 20-row frame against 1-row total
  * frames (the bounded crossJoin tier).
  */
object Profiling {

  /** Fixed PSI binning: n_chars DIV 256, capped into the last bin. A
    * FIXED bin domain (not data-derived quantiles) is deliberate — drift
    * alarms must compare releases on identical bins, and a binning
    * derived from the drifted data would partially absorb the drift it
    * is measuring. Shared with the ingest-time monitor
    * (`streaming/DriftStream`) so stream and batch alarm on the same
    * histogram.
    */
  private[graft] val PsiBins = 20L
  private[graft] val PsiBinWidth = 256L

  /** The shared binning expression:
    * `least(greatest(<col> DIV width, 0), bins-1)`. DIV (not `/`)
    * keeps the arithmetic integer-exact on both engines; the
    * greatest-0 clamp makes invalid negative values land in bin 0 on
    * BOTH engines — without it Spark's DIV (truncate toward zero) and
    * DuckDB's // (floor) disagree on negatives, and a bin below the
    * spine would silently vanish from the histogram instead of
    * alarming.
    */
  private[graft] def psiBin(colName: String): Column =
    least(greatest(expr(s"$colName DIV $PsiBinWidth"), lit(0L)),
      lit(PsiBins - 1))

  /** One-scan column profile: per column, the table row count, non-null
    * count (completeness numerator), distinct cardinality, and numeric
    * min/max (NULL for non-numeric columns — the emission stays
    * type-stable so the frame hashes deterministically).
    *
    * `exact = true` uses `count(DISTINCT …)` (the oracle-replayable
    * gate form); `exact = false` uses HLL (`approx_count_distinct`),
    * the 100 TB form — distinctness is the one profile metric whose
    * exact computation shuffles per-column value domains, and ±2%
    * answers the completeness/cardinality questions profiling asks.
    */
  private[graft] def columnProfile(df: DataFrame,
      cols: Seq[(String, Boolean)], exact: Boolean): DataFrame = {
    def nd(c: String): Column =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: cols.flatMap {
      case (c, numeric) => Seq(
        count(col(c)).as(s"nn_$c"),
        nd(c).as(s"nd_$c"),
        (if (numeric) min(col(c)).cast("long")
         else lit(null).cast("long")).as(s"mn_$c"),
        (if (numeric) max(col(c)).cast("long")
         else lit(null).cast("long")).as(s"mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the 1-row metric frame to one row per column — driver-tier
    // reshaping of |cols| values, the corpus never sees it
    val rows = cols.map { case (c, _) =>
      struct(lit(c).as("col_name"), col("n_rows"),
        col(s"nn_$c").as("n_nonnull"), col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("num_min"), col(s"mx_$c").as("num_max"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** One declarative data-quality constraint (the Deequ `Check` shape).
    * Three kinds, all reporting a BIGINT violation count:
    *   - [[RowCheck]]: a per-row violation predicate — folds into the
    *     single wide aggregation pass;
    *   - [[AggCheck]]: a violation-count aggregate expression (key
    *     uniqueness, cardinality floors) — same pass;
    *   - [[RefCheck]]: a pre-aggregated 1-row violations frame for
    *     checks that need their own plan (referential anti-joins) —
    *     crossJoined in (1-row × 1-row, the bounded stats tier).
    */
  sealed trait Check { def name: String }
  final case class RowCheck(name: String, violation: Column) extends Check
  final case class AggCheck(name: String, violations: Column) extends Check
  final case class RefCheck(name: String, violations: DataFrame) extends Check

  /** Declarative constraint suite over a table — q55's shape factored
    * into the reusable operator (ONE definition, q55 and p19 both run
    * through it): every scan-level check folds into ONE wide
    * partial+final hash aggregation over a single pass of the table —
    * N checks never mean N scans — and each [[RefCheck]]'s 1-row frame
    * joins in at driver-tier cost. Emits one row per check in the
    * declared order: (check_name, violations, total, pass).
    */
  /** The per-row violation fold — ONE definition for batch and stream:
    * [[constraintReport]] builds its RowCheck lanes from it, and
    * `EventStream.dqMonitor` folds the same expression over the ingest
    * stream (an agg in complete/update mode), so a constraint cannot
    * mean different things at rest and in flight.
    */
  private[graft] def rowViolations(pred: Column): Column =
    sum(when(pred, 1L).otherwise(0L))

  private[graft] def constraintReport(df: DataFrame,
      checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "constraintReport needs at least one check")
    val scanAggs = count(lit(1)).as("total") +: checks.zipWithIndex.collect {
      case (RowCheck(_, pred), i) => rowViolations(pred).as(s"v_$i")
      case (AggCheck(_, v), i) => v.cast("long").as(s"v_$i")
    }
    val scanMetrics = df.agg(scanAggs.head, scanAggs.tail: _*)
    val withRefs = checks.zipWithIndex.collect {
      case (RefCheck(_, frame), i) =>
        frame.select(frame.columns.head).toDF(s"v_$i")
    }.foldLeft(scanMetrics)(_ crossJoin _)
    // typed unpivot (columnProfile's explode(array(struct…)) shape) —
    // check names stay data, never spliced into SQL text, so a name
    // with quotes/parens cannot break the plan
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"),
        col(s"v_$i").cast("long").as("violations"))
    }
    withRefs
      .select(explode(array(rows: _*)).as("r"), col("total"))
      .select(col("r.check_name").as("check_name"),
        col("r.violations").as("violations"), col("total"),
        (col("r.violations") === 0L).as("pass"))
  }

  /** Zero-filled counts over the FULL fixed bin domain: every count
    * frame (keyed `bin`) left-joins onto the 0..PsiBins-1 spine and
    * absent bins coalesce to 0 — an emptied bin IS drift and must
    * participate in the smoothing. ONE definition for batch (p18) and
    * stream (`DriftStream.psiAgainst`), so the two cannot diverge on
    * the bin domain or the fill semantics.
    */
  private[graft] def spineCounts(s: SparkSession,
      parts: Seq[DataFrame]): DataFrame = {
    val spine = s.range(0, PsiBins).select(col("id").as("bin"))
    val joined = parts.foldLeft(spine)(_.join(_, Seq("bin"), "left"))
    val valueCols = joined.columns.filter(_ != "bin")
    joined.select(col("bin") +:
      valueCols.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
  }

  /** PSI terms between two already-binned count frames. Laplace add-1
    * smoothing over the FIXED `PsiBins`-bin domain keeps every log
    * finite (empty bins carry probability 1/(N+B), not 0) — the
    * standard monitoring-practice smoothing, and the reason the bin
    * spine below materializes all 20 bins rather than only occupied
    * ones: a bin that empties out IS drift and must contribute.
    */
  private[graft] def psiTerm(nRef: Column, nCur: Column,
      totRef: Column, totCur: Column): Column = {
    val p = (nRef.cast("double") + lit(1.0)) /
      (totRef.cast("double") + lit(PsiBins.toDouble))
    val q = (nCur.cast("double") + lit(1.0)) /
      (totCur.cast("double") + lit(PsiBins.toDouble))
    (p - q) * log(p / q)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Deequ-style table profile of `documents` — see [[columnProfile]].
    // The gate runs the exact form; the HLL scale form is pinned against
    // it in ProfilingSpec.
    "p17_column_profile" -> ((s, dir) =>
      columnProfile(Tables.documents(s, dir),
        Seq("doc_id" -> true, "text" -> false, "lang" -> false,
          "source" -> false, "n_chars" -> true), exact = true)),

    // Population Stability Index between two corpus snapshots —
    // reference = even doc_ids, current = odd (standing in for release
    // N vs N+1). One ≤ 20-key conditional-sum aggregation over the
    // corpus; the per-bin PSI terms and their total ride on a 20-row
    // frame. Emits the full per-bin evidence (counts + term), not just
    // the scalar — the triage view a drift alarm links to.
    "p18_drift_psi" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(
        psiBin("n_chars").as("bin"),
        (col("doc_id") % 2 === 0).as("is_ref"))
      val counts = d.groupBy("bin").agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
      psiOverCounts(spineCounts(s, Seq(counts)))
    }),

    // Documents-table constraint suite through [[constraintReport]] —
    // q55's operator on the corpus table: text completeness, the
    // n_chars == length(text) cross-column consistency a broken
    // upstream writer breaks first, non-negativity, doc_id uniqueness
    // (AggCheck), and a language allow-list. The allow-list DELIBERATELY
    // omits zh, so `domain_lang_allowed` fails with a real count at
    // every SF — the q55 rule: a report that can only pass tests
    // nothing. One scan; no ref check here (q55 exercises that arm).
    "p19_doc_constraints" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      constraintReport(d, Seq(
        RowCheck("completeness_text", col("text").isNull),
        RowCheck("consistent_n_chars",
          col("n_chars") =!= length(col("text"))),
        RowCheck("nonneg_n_chars", col("n_chars") < 0),
        RowCheck("domain_lang_allowed",
          !col("lang").isin("en", "fr", "es", "de")),
        AggCheck("unique_doc_id",
          count(lit(1)) - countDistinct(col("doc_id")))))
    })
  )

  /** PSI terms + total over an already-binned, already-spined count
    * frame (bin, n_ref, n_cur) — the arithmetic half of p18, factored
    * out so the streaming monitor (`streaming/DriftStream`) scores its
    * live counts through the EXACT definition the batch gate certifies.
    */
  private[graft] def psiOverCounts(filled: DataFrame): DataFrame = {
    val totals = filled.agg(sum("n_ref").as("tot_ref"),
      sum("n_cur").as("tot_cur"))
    // 20-row × 1-row crossJoin — the bounded stats-frame tier
    filled.crossJoin(totals)
      .select(col("bin"), col("n_ref"), col("n_cur"),
        psiTerm(col("n_ref"), col("n_cur"),
          col("tot_ref"), col("tot_cur")).as("psi_term"))
      .withColumn("psi_total",
        // orderBy(bin) + full frame: the sort fixes the 20-term fold
        // order, so the total is bit-deterministic across partition
        // layouts (an unordered frame would fold in physical row order)
        sum("psi_term").over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(lit(1)).orderBy("bin")
            .rowsBetween(Long.MinValue, Long.MaxValue)))
  }

  val oracleSql: Map[String, String] = Map(

    "p17_column_profile" ->
      """WITH s AS (SELECT count(*)::BIGINT AS n_rows,
        |  count(doc_id)::BIGINT AS nn_doc_id,
        |  count(DISTINCT doc_id)::BIGINT AS nd_doc_id,
        |  min(doc_id)::BIGINT AS mn_doc_id, max(doc_id)::BIGINT AS mx_doc_id,
        |  count(text)::BIGINT AS nn_text,
        |  count(DISTINCT text)::BIGINT AS nd_text,
        |  count(lang)::BIGINT AS nn_lang,
        |  count(DISTINCT lang)::BIGINT AS nd_lang,
        |  count(source)::BIGINT AS nn_source,
        |  count(DISTINCT source)::BIGINT AS nd_source,
        |  count(n_chars)::BIGINT AS nn_n_chars,
        |  count(DISTINCT n_chars)::BIGINT AS nd_n_chars,
        |  min(n_chars)::BIGINT AS mn_n_chars, max(n_chars)::BIGINT AS mx_n_chars
        |  FROM documents)
        |SELECT 'doc_id' AS col_name, n_rows, nn_doc_id AS n_nonnull,
        |  nd_doc_id AS n_distinct, mn_doc_id AS num_min, mx_doc_id AS num_max
        |FROM s
        |UNION ALL SELECT 'text', n_rows, nn_text, nd_text,
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM s
        |UNION ALL SELECT 'lang', n_rows, nn_lang, nd_lang,
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM s
        |UNION ALL SELECT 'source', n_rows, nn_source, nd_source,
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM s
        |UNION ALL SELECT 'n_chars', n_rows, nn_n_chars, nd_n_chars,
        |  mn_n_chars, mx_n_chars FROM s""".stripMargin,

    // identical smoothing arithmetic, identical double-op order; the
    // psi_total window sum may fold in a different order — covered by
    // the gate's 1e-9 relative tolerance (t21's discipline)
    "p18_drift_psi" ->
      """WITH b AS (SELECT least(greatest(n_chars // 256, 0), 19)::BIGINT
        |    AS bin,
        |    doc_id % 2 = 0 AS is_ref FROM documents),
        |c AS (SELECT bin,
        |    sum(CASE WHEN is_ref THEN 1 ELSE 0 END)::BIGINT AS n_ref,
        |    sum(CASE WHEN is_ref THEN 0 ELSE 1 END)::BIGINT AS n_cur
        |  FROM b GROUP BY bin),
        |sp AS (SELECT unnest(range(0, 20))::BIGINT AS bin),
        |j AS (SELECT sp.bin, coalesce(c.n_ref, 0)::BIGINT AS n_ref,
        |    coalesce(c.n_cur, 0)::BIGINT AS n_cur
        |  FROM sp LEFT JOIN c ON sp.bin = c.bin),
        |t AS (SELECT sum(n_ref)::BIGINT AS tot_ref,
        |    sum(n_cur)::BIGINT AS tot_cur FROM j),
        |e AS (SELECT bin, n_ref, n_cur,
        |    ((n_ref + 1.0) / (tot_ref + 20.0) -
        |     (n_cur + 1.0) / (tot_cur + 20.0)) *
        |    ln(((n_ref + 1.0) / (tot_ref + 20.0)) /
        |       ((n_cur + 1.0) / (tot_cur + 20.0))) AS psi_term
        |  FROM j, t)
        |SELECT bin, n_ref, n_cur, psi_term,
        |  sum(psi_term) OVER () AS psi_total FROM e""".stripMargin,

    "p19_doc_constraints" ->
      """WITH s AS (SELECT count(*)::BIGINT AS total,
        |  sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT AS v0,
        |  sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)::BIGINT
        |    AS v1,
        |  sum(CASE WHEN n_chars < 0 THEN 1 ELSE 0 END)::BIGINT AS v2,
        |  sum(CASE WHEN lang NOT IN ('en','fr','es','de') THEN 1 ELSE 0 END)
        |    ::BIGINT AS v3,
        |  (count(*) - count(DISTINCT doc_id))::BIGINT AS v4
        |  FROM documents),
        |u AS (
        |  SELECT 'completeness_text' AS check_name, v0 AS violations, total
        |    FROM s
        |  UNION ALL SELECT 'consistent_n_chars', v1, total FROM s
        |  UNION ALL SELECT 'nonneg_n_chars', v2, total FROM s
        |  UNION ALL SELECT 'domain_lang_allowed', v3, total FROM s
        |  UNION ALL SELECT 'unique_doc_id', v4, total FROM s)
        |SELECT check_name, violations, total, violations = 0 AS pass
        |FROM u""".stripMargin
  )
}
