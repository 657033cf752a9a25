package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Evidence for the SURVEY §2.3 bucketing claim: two tables bucketed and
  * sorted on the join key join with NO shuffle exchange — the co-located
  * fact-fact join that replaces a full two-sided shuffle at 100 TB
  * (bucket count chosen once at write time; every subsequent join on the
  * bucket key reads co-partitioned files directly).
  */
class BucketedJoinSpec extends SparkSuite {

  test("bucketed+sorted tables sort-merge join without an Exchange") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_bucketed").toFile
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the non-broadcast path so the join strategy under test is
      // the sort-merge join the big-fact case would use
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def write(name: String, rows: Seq[(Long, Double)]): Unit =
        rows.toDF("k", "v").write
          .bucketBy(4, "k").sortBy("k")
          .option("path", s"${wh.getAbsolutePath}/$name")
          .mode("overwrite")
          .saveAsTable(name)
      write("graft_fact_a", (0L until 500L).map(i => (i, i * 1.0)))
      write("graft_fact_b", (0L until 500L).map(i => (i, i * 2.0)))

      val joined = spark.table("graft_fact_a")
        .join(spark.table("graft_fact_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 500)

      // and the result is correct, not just shuffle-free
      val r = joined.select(sum(col("graft_fact_a.v") + col("graft_fact_b.v")))
        .head().getDouble(0)
      assert(r == (0 until 500).map(i => i * 3.0).sum)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS graft_fact_a")
      spark.sql("DROP TABLE IF EXISTS graft_fact_b")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(wh)
    }
  }
}
