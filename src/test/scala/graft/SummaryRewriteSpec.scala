package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.SummaryRewrite

/** Semantics + scope guards of the materialized-aggregate rewrite
  * ([[graft.plans.SummaryRewrite]]): fires only on covered aggregates
  * over the registered base path, serves bit-identical answers from the
  * summary, and leaves every non-covered plan untouched.
  */
class SummaryRewriteSpec extends SparkSuite {

  private def withSummary[T](keys: Seq[String], measures: Seq[String])
      (body: (String, String) => T): T = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mvspec").toString
    val base = s"$dir/base.parquet"
    try {
      // deliberate nulls in `v` so avg/count(v) exercise the null-count
      // decomposition; group "c" is ALL-null in v (avg must stay NULL)
      Seq(
        ("a", 1L, Some(2.0)), ("a", 2L, Some(4.0)), ("a", 3L, None),
        ("b", 5L, Some(1.5)), ("b", 7L, Some(2.5)),
        ("c", 11L, None), ("c", 13L, None))
        .toDF("k", "n", "v")
        .write.mode("overwrite").parquet(base)
      SummaryRewrite.buildSummary(spark.read.parquet(base), keys, measures)
        .write.mode("overwrite").parquet(s"$dir/summary")
      GraftExtensions.register(spark)
      spark.conf.set(SummaryRewrite.BaseConf, base)
      spark.conf.set(SummaryRewrite.PathConf, s"$dir/summary")
      spark.conf.set(SummaryRewrite.KeysConf, keys.mkString(","))
      spark.conf.set(SummaryRewrite.MeasuresConf, measures.mkString(","))
      body(base, dir)
    } finally {
      Seq(SummaryRewrite.BaseConf, SummaryRewrite.PathConf,
        SummaryRewrite.KeysConf, SummaryRewrite.MeasuresConf)
        .foreach(spark.conf.unset)
      graft.util.Fs.rmTree(new java.io.File(dir))
    }
  }

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten

  private def fired(df: DataFrame): Boolean = {
    val ps = scanPaths(df)
    ps.exists(_.contains("summary")) && !ps.exists(_.contains("base.parquet"))
  }

  private def naiveAgg(base: String): DataFrame =
    spark.read.parquet(base).groupBy("k")
      .agg(count(lit(1)).as("n_rows"), count(col("v")).as("n_v"),
        sum("n").as("sum_n"), avg("v").as("avg_v"),
        min("n").as("min_n"), max("v").as("max_v"))

  test("covered aggregate is served from the summary, bit-identical") {
    withSummary(Seq("k"), Seq("n", "v")) { (base, _) =>
      val q = naiveAgg(base)
      assert(fired(q), s"rewrite did not fire:\n${q.queryExecution.optimizedPlan}")
      spark.conf.unset(SummaryRewrite.BaseConf)
      val truth = naiveAgg(base).collect().map(_.toSeq).toSet
      spark.conf.set(SummaryRewrite.BaseConf, base)
      val got = q.collect().map(_.toSeq).toSet
      assert(got == truth, s"summary-served != base truth\n got $got\nwant $truth")
      // all-null group: avg stays NULL (no ANSI div-by-zero), count(v)=0
      val cRow = q.filter(col("k") === "c").first()
      assert(cRow.isNullAt(cRow.fieldIndex("avg_v")))
      assert(cRow.getLong(cRow.fieldIndex("n_v")) == 0L)
    }
  }

  test("rewritten frame keeps exprIds: downstream ops resolve unchanged") {
    import spark.implicits._
    withSummary(Seq("k"), Seq("n", "v")) { (base, _) =>
      val q = naiveAgg(base).filter(col("sum_n") > 5L)
        .join(Seq("a", "b").toDF("k"), "k")
        .orderBy("k")
      assert(q.collect().map(_.getString(0)).toSeq == Seq("a", "b"))
    }
  }

  test("mergeSummaries == rebuild from scratch (incl. delta-only groups)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mvmerge").toString
    try {
      val basePart = Seq(
        ("a", 1L, Some(2.0)), ("a", 2L, None), ("b", 5L, Some(1.5)))
        .toDF("k", "n", "v")
      val deltaPart = Seq(
        ("a", 3L, Some(6.0)), ("c", 11L, None), ("c", 13L, Some(9.0)))
        .toDF("k", "n", "v")
      val keys = Seq("k"); val ms = Seq("n", "v")
      val merged = SummaryRewrite.mergeSummaries(
        SummaryRewrite.buildSummary(basePart, keys, ms),
        SummaryRewrite.buildSummary(deltaPart, keys, ms), keys, ms)
      val rebuilt = SummaryRewrite.buildSummary(
        basePart.unionByName(deltaPart), keys, ms)
      val m = merged.collect().map(r => r.getString(0) -> r.toSeq).toMap
      val t = rebuilt.collect().map(r => r.getString(0) -> r.toSeq).toMap
      assert(m == t, s"merged != rebuilt\n got $m\nwant $t")
      assert(m.keySet == Set("a", "b", "c")) // "c" exists only in the delta
    } finally graft.util.Fs.rmTree(new java.io.File(dir))
  }

  test("scope guards: uncovered shapes leave the plan untouched") {
    withSummary(Seq("k"), Seq("n")) { (base, _) =>
      val b = spark.read.parquet(base)
      // conf off → no fire
      spark.conf.unset(SummaryRewrite.BaseConf)
      assert(!fired(b.groupBy("k").agg(sum("n").as("s"))))
      spark.conf.set(SummaryRewrite.BaseConf, base)
      // filter below the aggregate (cannot be answered from merged states)
      assert(!fired(b.filter(col("n") > 2L).groupBy("k")
        .agg(sum("n").as("s"))))
      // DISTINCT aggregate
      assert(!fired(b.groupBy("k").agg(countDistinct("n").as("s"))))
      // aggregate over a non-registered measure ("v" not in summary)
      assert(!fired(b.groupBy("k").agg(sum("v").as("s"))))
      // grouping on a non-key column
      assert(!fired(b.groupBy("n").agg(count(lit(1)).as("c"))))
      // non-decomposable aggregate function
      assert(!fired(b.groupBy("k").agg(expr("median(n)").as("m"))))
      // expression (not bare column) under the aggregate
      assert(!fired(b.groupBy("k").agg(sum(col("n") * 2).as("s"))))
      // and the guarded shapes still compute correctly (rule present)
      val got = b.filter(col("n") > 2L).groupBy("k").agg(sum("n").as("s"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("a" -> 3L, "b" -> 12L, "c" -> 24L))
    }
  }

  test("broken summary path degrades to the base scan, not a plan error") {
    withSummary(Seq("k"), Seq("n")) { (base, dir) =>
      // summary deleted while the confs are still registered — the exact
      // operational window the rule must survive: every query over the
      // base path must still PLAN (and answer from the base scan), never
      // fail at optimization time
      graft.util.Fs.rmTree(new java.io.File(s"$dir/summary"))
      val q = spark.read.parquet(base).groupBy("k")
        .agg(sum("n").as("sum_n"))
      assert(!fired(q), "rule fired against a deleted summary")
      val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("a" -> 6L, "b" -> 12L, "c" -> 24L))
    }
  }

  test("retried batchId after a mid-fold failure is re-applied, not skipped") {
    import graft.streaming.SummaryStream
    import spark.implicits._
    val state = new SummaryStream.SummaryState(Seq("k"), Seq("n"))
    try {
      state.ingest(Seq(("a", 1L), ("b", 2L)).toDF("k", "n"), batchId = 0L)
      // batch 1 fails mid-fold: the frame lacks the measure column, so
      // buildSummary's analysis throws INSIDE ingest — a failed attempt
      intercept[Throwable] {
        state.ingest(Seq(("a", 7L)).toDF("k", "wrong"), batchId = 1L)
      }
      // the engine retries the SAME batchId with the real rows; the
      // exactly-once guard must treat the failed attempt as uncommitted
      state.ingest(Seq(("a", 10L)).toDF("k", "n"), batchId = 1L)
      val got = state.snapshot.get
        .select(col("k"), col(graft.plans.SummaryRewrite.sumCol("n")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("a" -> 11L, "b" -> 2L),
        s"retried batch was dropped: $got")
      // and a genuine re-delivery of the committed id stays a no-op
      state.ingest(Seq(("a", 100L)).toDF("k", "n"), batchId = 1L)
      val again = state.snapshot.get
        .select(col("k"), col(graft.plans.SummaryRewrite.sumCol("n")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(again == got, "re-delivered committed batchId mutated state")
    } finally state.close()
  }

}
