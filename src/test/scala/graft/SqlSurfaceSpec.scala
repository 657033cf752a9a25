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
}
