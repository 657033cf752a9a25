package graft

import org.apache.spark.sql.functions._

import graft.source.{GridFixtures, GridReader, GridWriter}

class GridWriterSpec extends SparkSuite {

  private lazy val srcDir = GridFixtures.ensure(spark, "writer-src", n = 4)
  private lazy val outDir = "target/grid-fixtures/writer-hive"

  private def written() = {
    val df = new GridReader(spark, srcDir)
      .fetch(GridFixtures.t0, GridFixtures.t0.plusSeconds(4 * 600),
        250000.0, 400000.0)
    GridWriter.writePartitioned(df, outDir)
    GridWriter.readPartitioned(spark, outDir)
  }

  test("partitioned round-trip preserves rows and values") {
    val back = written()
    val n = GridFixtures.lonAxis.length * GridFixtures.latAxis.length *
      GridFixtures.hAxis.length
    assert(back.count() == 4L * n)
    // values survive the round trip exactly
    val bad = back.withColumn("t", col("time").cast("double"))
      .filter(abs(col("`rho[kg/m^3]`") -
        (lit(1.0e-9) + lit(1.0e-15) * col("t") + lit(2.0e-12) * col("lon")
          - lit(3.0e-12) * col("lat") - lit(1.0e-15) * col("h"))) > 1e-24)
    assert(bad.count() == 0)
  }

  test("time filter becomes Catalyst partition pruning (no manual lists)") {
    written()
    val pruned = spark.read.parquet(outDir)
      .filter(col(GridWriter.PartitionCol) === "2024-04-09T05:10:00")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ts"), plan)
    assert(pruned.count() ==
      GridFixtures.lonAxis.length.toLong * GridFixtures.latAxis.length *
        GridFixtures.hAxis.length)
    // only one of the four timestep directories is read (the partition
    // value's colons are percent-escaped in the on-disk directory name)
    val scanned = pruned.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(p =>
      p.contains("05%3A10%3A00") || p.contains("05:10:00") ||
        p.contains("05%253A10%253A00")), scanned.mkString(", "))
  }

  test("h filter pushes to parquet stats on h-sorted files") {
    val back = written()
    val filtered = back.filter(col("h").between(300000.0, 320000.0))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(h), GreaterThanOrEqual(h,300000.0), LessThanOrEqual(h,320000.0)"),
      plan)
    assert(filtered.count() ==
      4L * GridFixtures.lonAxis.length * GridFixtures.latAxis.length * 2)
  }
}
