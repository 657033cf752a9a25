package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.graftexpr.{CosineSim, DotProduct, LinearTextScore, SigAgree}

/** Session extension: registers the engine's native expressions as SQL
  * functions, so `spark.sql("SELECT graft_dot(a, b) …")` reaches the
  * codegen'd kernel directly, plus the [[graft.plans.RangeJoinRewrite]]
  * optimizer rule (conf-gated; a no-op until its width conf is set).
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`,
  * or call [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.SummaryRewrite)
  }
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"graft_dot expects 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      }),
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"graft_cosine expects 2 arguments, got ${children.length}")
        CosineSim(children.head, children(1))
      }),
    (FunctionIdentifier("graft_sig_agree"),
      new ExpressionInfo(classOf[SigAgree].getName, "graft_sig_agree"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"graft_sig_agree expects 2 arguments, got ${children.length}")
        SigAgree(children.head, children(1))
      }),
    (FunctionIdentifier("graft_text_score"),
      new ExpressionInfo(classOf[LinearTextScore].getName, "graft_text_score"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"graft_text_score expects 2 arguments, got ${children.length}")
        LinearTextScore(children.head, children(1))
      }))

  /** Register on an already-built session (tests, spark-shell): the SQL
    * functions, plus the range-join rescue rule via
    * `experimental.extraOptimizations` (the live-session counterpart of
    * injectOptimizerRule; the rule no-ops until its width conf is set,
    * so registration alone changes no plan).
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    Seq(graft.plans.RangeJoinRewrite, graft.plans.SummaryRewrite)
      .foreach { rule =>
        if (!spark.experimental.extraOptimizations.contains(rule)) {
          spark.experimental.extraOptimizations =
            spark.experimental.extraOptimizations :+ rule
        }
      }
  }
}
