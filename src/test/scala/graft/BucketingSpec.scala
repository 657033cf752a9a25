package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.source.Bucketed

/** Pins the co-located-join property that justifies Bucketed.write: two
  * tables bucketed on the same key into the same bucket count join with
  * ZERO Exchange in the physical plan — the shuffle is paid once at
  * layout time, not on every join (the 100 TB fact-fact design, SURVEY
  * §4). Broadcast is disabled inside the test so the assertion exercises
  * the shuffle path a big-big join would take.
  */
class BucketingSpec extends SparkSuite {

  test("bucketed co-located join plans with zero Exchange") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bucket_").toFile
    val a = (0L until 1000L).map(i => (i % 37, i)).toDF("k", "va")
    val b = (0L until 500L).map(i => (i % 37, i * 2)).toDF("k", "vb")
    try {
      Bucketed.write(a, "bkt_a", "k", 4, s"${dir.getAbsolutePath}/a")
      Bucketed.write(b, "bkt_b", "k", 4, s"${dir.getAbsolutePath}/b")
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = Bucketed.table(spark, "bkt_a")
          .join(Bucketed.table(spark, "bkt_b"), "k")
          .groupBy("k").agg(count(lit(1)).as("n"))
        // force execution so AQE finalizes the plan it actually ran
        val n = joined.count()
        assert(n == 37)
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"),
          s"expected a sort-merge join over bucket-aligned scans:\n$plan")
        // the join itself must not reshuffle either side; the only
        // acceptable Exchange is the one ABOVE the join for the final
        // aggregation — and even that is elided here because the groupBy
        // key IS the bucket key, so partitioning carries through
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle:\n$plan")
        // unbucketed control under the same no-broadcast config: the same
        // join DOES plan a shuffle Exchange — the assertion above is
        // meaningful, not vacuously true of every small join
        val control = a.join(b, "k").groupBy("k").agg(count(lit(1)).as("n"))
        assert(control.queryExecution.executedPlan.toString
          .contains("Exchange"))
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
      graft.util.Fs.rmTree(dir)
    }
  }
}
