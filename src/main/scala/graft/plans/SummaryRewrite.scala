package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Materialized-aggregate rewrite (the classic summary-table / MV-matching
  * optimization, Gupta & Mumick's view-answering shape restricted to the
  * decomposable-aggregate case).
  *
  * A pipeline that repeatedly aggregates an append-mostly 100 TB fact table
  * by low-cardinality keys pays a full scan per question. The fix every
  * warehouse ships is a pre-aggregated summary: per key-combination, the
  * COUNT / per-measure (sum, non-null count, min, max) partial states —
  * exactly the algebra q50's shard-merge query certifies — typically
  * 10³-10⁶× smaller than the fact table. This rule lets the USER keep
  * writing the naive aggregate over the base table: when a registered
  * summary covers the query, the plan is rewritten to merge the summary's
  * partial states instead of rescanning the base — count(*) → sum(cnt),
  * sum(x) → sum(sum_x), min/max(x) → min/max(min_x/max_x), count(x) →
  * sum(cnt_x), avg(x) → sum(sum_x) / sum(cnt_x) (null-count-correct, and
  * zero-guarded so an all-null group still yields NULL, never an ANSI
  * div-by-zero). Results are EXACT, not approximate, provided the summary
  * was built from the same base snapshot — freshness is the caller's
  * contract, same as any materialized view.
  *
  * Scope guards (any miss bails to the untouched plan): the aggregate's
  * child must be a parquet scan of the registered base path (bare or
  * behind a column-pruning Project — NO Filter: a residual predicate on a
  * non-key column cannot be answered from merged states); every grouping
  * expression a bare key column of the summary; every aggregate one of
  * the five decomposable forms above over a registered measure, DISTINCT
  * and FILTER clauses excluded; DecimalType excluded (sum widens
  * precision mid-merge). The rewrite aliases its output to the ORIGINAL
  * attribute names and exprIds, so parent operators resolve unchanged.
  * Idempotent by construction: the rewritten child scans the summary
  * path, which no longer matches the base-path guard.
  *
  * Conf-gated like [[RangeJoinRewrite]]: all four confs must be set, and
  * they should be set only AFTER the summary is built (the builder's own
  * aggregate over the base table would otherwise match its own output).
  */
object SummaryRewrite extends Rule[LogicalPlan] {

  /** Root path of the base table the summary covers; unset → rule off. */
  val BaseConf = "spark.graft.summary.basePath"

  /** Path of the summary parquet written by [[buildSummary]]. */
  val PathConf = "spark.graft.summary.summaryPath"

  /** Comma-separated grouping key columns the summary carries. */
  val KeysConf = "spark.graft.summary.keys"

  /** Comma-separated measure columns the summary carries states for. */
  val MeasuresConf = "spark.graft.summary.measures"

  val CntCol = "_graft_cnt"
  def sumCol(c: String): String = s"_graft_sum_$c"
  def cntCol(c: String): String = s"_graft_cnt_$c"
  def minCol(c: String): String = s"_graft_min_$c"
  def maxCol(c: String): String = s"_graft_max_$c"

  /** Build the summary frame for `keys` × `measures` over `base` — one
    * hash aggregate (partial+final, map-side combined), the one full scan
    * the summary exists to amortize. Write it wherever the serving layout
    * lives and register the four confs to activate the rule.
    */
  def buildSummary(base: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as(CntCol) +:
      measures.flatMap(c => Seq(
        sum(col(c)).as(sumCol(c)), count(col(c)).as(cntCol(c)),
        min(col(c)).as(minCol(c)), max(col(c)).as(maxCol(c))))
    base.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental refresh: merge two summaries built by [[buildSummary]]
    * over the same keys × measures — q50's partial-state algebra as the
    * maintenance operator. (cnt, sum, cnt_m, min, max) states combine by
    * (sum, sum, sum, min, max) without touching a single base row, so
    * appending a delta to a 100 TB base costs one scan of the DELTA plus
    * a |summary|-sized merge, never a rebuild. Exact for these five
    * states (q50's certified algebra); avg stays exact because it is
    * derived, not stored.
    */
  def mergeSummaries(a: DataFrame, b: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = sum(col(CntCol)).as(CntCol) +:
      measures.flatMap(c => Seq(
        sum(col(sumCol(c))).as(sumCol(c)),
        sum(col(cntCol(c))).as(cntCol(c)),
        min(col(minCol(c))).as(minCol(c)),
        max(col(maxCol(c))).as(maxCol(c))))
    a.unionByName(b).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val basePath = conf.getConfString(BaseConf, "")
    val sumPath = conf.getConfString(PathConf, "")
    val keys = split(conf.getConfString(KeysConf, ""))
    val measures = split(conf.getConfString(MeasuresConf, ""))
    if (basePath.isEmpty || sumPath.isEmpty || keys.isEmpty) plan
    else plan.transformUp {
      case a @ Aggregate(_, _, child, _)
          if scansPath(child, basePath) =>
        rewrite(a, sumPath, keys.toSet, measures.toSet).getOrElse(a)
    }
  }

  private def split(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def norm(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  /** True iff `p` is (a column-pruning Project over) a parquet relation
    * rooted at `path` — Filters deliberately NOT looked through.
    */
  private def scansPath(p: LogicalPlan, path: String): Boolean = p match {
    case Project(pl, rel: LogicalRelation)
        if pl.forall(_.isInstanceOf[AttributeReference]) =>
      relPaths(rel).contains(norm(path))
    case rel: LogicalRelation => relPaths(rel).contains(norm(path))
    case _ => false
  }

  private def relPaths(rel: LogicalRelation): Seq[String] = rel.relation match {
    case h: HadoopFsRelation => h.location.rootPaths.map(p => norm(p.toString))
    case _ => Nil
  }

  private def rewrite(a: Aggregate, sumPath: String, keys: Set[String],
      measures: Set[String]): Option[LogicalPlan] = {
    // every grouping expression must be a bare registered key column
    val groupAttrs = a.groupingExpressions.map {
      case ar: AttributeReference if keys.contains(ar.name) => ar
      case _ => return None
    }
    if (a.aggregateExpressions.exists(e => e.dataType.isInstanceOf[DecimalType]))
      return None

    // analyzed scan of the summary (schema from footers; no job runs
    // here). Guarded: a deleted/corrupt summary while the confs are still
    // set must degrade to the untouched (still-correct) base-scan plan,
    // not fail every query over the base path at optimization time.
    val sumRel = scala.util.Try(
      SparkSession.active.read.parquet(sumPath).queryExecution.analyzed
    ).getOrElse(return None)
    def sumAttr(name: String): Option[AttributeReference] =
      sumRel.output.collectFirst {
        case ar: AttributeReference if ar.name == name => ar
      }
    val cntAttr = sumAttr(CntCol).getOrElse(return None)

    def measureAttr(f: String => String, c: String): Option[AttributeReference] =
      if (measures.contains(c)) sumAttr(f(c)) else None

    def agg(fn: AggregateFunction): Expression =
      fn.toAggregateExpression()

    // translate one original aggregate-list entry; None → bail entirely
    def translate(e: Expression): Option[Expression] = e match {
      case ar: AttributeReference if keys.contains(ar.name) =>
        sumAttr(ar.name)
      case ae: AggregateExpression
          if !ae.isDistinct && ae.filter.isEmpty &&
            (ae.mode == Complete || ae.mode == Final) =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(1, _))) =>
            Some(Coalesce(Seq(agg(Sum(cntAttr)), Literal(0L))))
          case Count(Seq(ar: AttributeReference)) =>
            measureAttr(cntCol, ar.name)
              .map(c => Coalesce(Seq(agg(Sum(c)), Literal(0L))))
          case Sum(ar: AttributeReference, _) =>
            measureAttr(sumCol, ar.name).map(s => agg(Sum(s)))
          case Min(ar: AttributeReference) =>
            measureAttr(minCol, ar.name).map(m => agg(Min(m)))
          case Max(ar: AttributeReference) =>
            measureAttr(maxCol, ar.name).map(m => agg(Max(m)))
          case Average(ar: AttributeReference, _) =>
            for {
              s <- measureAttr(sumCol, ar.name)
              c <- measureAttr(cntCol, ar.name)
            } yield {
              val n = agg(Sum(c))
              val total = Cast(agg(Sum(s)), DoubleType)
              // all-null group: base avg is NULL; guard the division so
              // ANSI mode cannot throw on n = 0
              If(Or(IsNull(n), EqualTo(n, Literal(0L))),
                Literal(null, DoubleType),
                Divide(total, Cast(n, DoubleType)))
            }
          case _ => None
        }
      case _ => None
    }

    val newAggExprs: Seq[NamedExpression] = a.aggregateExpressions.map {
      case al @ Alias(inner, name) =>
        translate(inner) match {
          case Some(ne) => Alias(ne, name)(exprId = al.exprId,
            qualifier = al.qualifier)
          case None => return None
        }
      case ar: AttributeReference if keys.contains(ar.name) =>
        sumAttr(ar.name) match {
          case Some(sa) => Alias(sa, ar.name)(exprId = ar.exprId)
          case None => return None
        }
      case _ => return None
    }

    val newGroup = groupAttrs.map(ar => sumAttr(ar.name).getOrElse(return None))
    val needed = sumRel.output.filter(o =>
      newAggExprs.exists(_.references.contains(o)) || newGroup.contains(o))
    Some(Aggregate(newGroup, newAggExprs, Project(needed, sumRel), None))
  }
}
