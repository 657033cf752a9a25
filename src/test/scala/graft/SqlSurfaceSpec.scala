package graft

/** SQL entry point: the whole table inventory as temp views + the
  * extension-registered functions, through `spark.sql`.
  */
class SqlSurfaceSpec extends SparkSuite {

  test("registerAll makes every driver table SQL-queryable") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """SELECT count(*) FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin)
      .head().getLong(0)
    assert(n == 6000L)
    // events view goes through the nanos-safe loader
    val ts = spark.sql("SELECT min(ts), max(ts) FROM events").head()
    assert(!ts.isNullAt(0) && !ts.isNullAt(1))
  }

  test("graft SQL functions compose with views") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    GraftExtensions.register(spark)
    val top = spark.sql(
      """SELECT vec_id, graft_dot(embedding, embedding) AS sq_norm
        |FROM embeddings ORDER BY sq_norm DESC LIMIT 3""".stripMargin)
      .collect()
    assert(top.length == 3 && top.forall(_.getDouble(1) > 0.0))
  }

  test("q47 correlated scalars decorrelate to aggregate + equi-join") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val plan = spark.sql(SparkEntry.oracleSql("q47_correlated_scalar"))
      .queryExecution.executedPlan.toString
    // decorrelated: the per-nation count/sum run ONCE as grouped
    // aggregates joined back on the correlation key — never a per-outer-
    // row re-execution (which would plan as a nested-loop join)
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("q48 EXISTS pair plans as one semi-join and one anti-join") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val plan = spark.sql(SparkEntry.oracleSql("q48_exists_rewrite"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
    // the price predicate reaches the anti branch's scan, not a
    // post-join filter: pushed-filter evidence in the parquet scan node
    assert(plan.contains("GreaterThan(o_totalprice,300000"), plan)
  }
}
