package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided test tables (see TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives `(spark, sfDir)` and reads
  * its inputs through these helpers so the scan is a plain
  * `spark.read.parquet` FileSourceScan — Catalyst predicate pushdown and
  * column pruning apply with no custom code.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS) which Spark's
    * vectorized reader rejects; read nanos as long and truncate to a µs
    * TimestampType (`ts DIV 1000` — integer division; a double division
    * would lose precision above 2^53 ns). Matches DuckDB's nanos→µs read.
    *
    * NOTE: this sets `spark.sql.legacy.parquet.nanosAsLong` for the whole
    * session — a deliberate session-level invariant here (only the events
    * table carries nanos, and the key has no per-read option form). A
    * deployment mixing nanos and non-nanos parquet should isolate reads in
    * a dedicated session.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }

  /** Pushdown-safe timestamp range predicate for [[events]]: the public
    * `ts` is computed (µs from nanos), so a `ts BETWEEN` filter cannot
    * reach parquet row-group stats; the equivalent predicate on the raw
    * INT64 nanos column can. `µs >= a ⇔ ns >= a·1000`;
    * `µs <= b ⇔ ns <= b·1000 + 999`.
    */
  def eventsTsBetween(startMicros: Long, endMicros: Long)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.col
    col("ts_ns").between(startMicros * 1000L, endMicros * 1000L + 999L)
  }

  /** Strict-upper-bound sibling of [[eventsTsBetween]]:
    * `µs < T ⇔ ns DIV 1000 < T ⇔ ns < T·1000` (integer division is
    * monotone) — keeps the nanos-encoding invariant in one place.
    */
  def eventsTsBefore(endMicros: Long): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.col
    col("ts_ns") < endMicros * 1000L
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  val AllTables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every driver table as a temp view so the whole inventory is
    * queryable through plain `spark.sql(...)` (SQL entry point; `events`
    * goes through the nanos-safe loader).
    */
  def registerAll(s: SparkSession, d: String): Unit =
    AllTables.foreach {
      case "events" => events(s, d).createOrReplaceTempView("events")
      case t => table(s, d, t).createOrReplaceTempView(t)
    }

  /** Spread a frame across the configured shuffle parallelism. The driver
    * test files are single-row-group parquet, so their scan stage runs on
    * one core no matter what `maxPartitionBytes` says — per-row kernel work
    * (sketching, signatures) must be re-spread first. A real multi-file
    * 100 TB table would never need this.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  /** Byte-targeted repartitioning — the reference's
    * `repartition(partition_size='200MB')` surface (dask_config.py /
    * kamodo_dask.py:233-244, SURVEY §2 P2) as a real operator, not a conf
    * mapping: partition count = ceil(plan-estimated bytes / target).
    *
    * The size source is Catalyst's own statistics (file sizes for scans,
    * propagated through the operator tree — the same numbers AQE and the
    * broadcast planner trust), so the estimate costs no extra job. It is
    * an ESTIMATE: post-filter sizes use Catalyst's selectivity guesses,
    * and decompression can grow data beyond its on-disk footprint — the
    * same caveats the reference's byte targeting has on compressed
    * parquet. For scan-side sizing prefer
    * `spark.sql.files.maxPartitionBytes` (no shuffle at all); use this
    * where the reference used it — to fix up pathological partitioning
    * mid-pipeline before expensive per-partition work.
    */
  def repartitionBySize(df: DataFrame,
      targetBytes: Long = 200L << 20): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // stats-less lineages (LogicalRDD, JDBC, streaming) report Catalyst's
    // defaultSizeInBytes sentinel (Long.MaxValue by default) — sizing from
    // it would shuffle into the million-partition cap; with no reliable
    // estimate the honest move is a no-op (any real plan is nowhere near
    // 4 EiB)
    if (bytes >= BigInt(Long.MaxValue) / 2) df
    else {
      val n = ((bytes + targetBytes - 1) / targetBytes).min(1 << 20).toInt
      df.repartition(math.max(n, 1))
    }
  }
}
