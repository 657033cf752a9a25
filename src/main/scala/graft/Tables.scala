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

  /** Schema-dispatched loader for events.parquet — the driver's generator
    * has shipped `ts` under two physical encodings, and this loader
    * survives either:
    *
    *  - INT64 TIMESTAMP(NANOS): Spark's reader rejects nanos outright, so
    *    the `nanosAsLong` escape hatch reads the raw nanos as `LongType`;
    *    `ts` is then derived as a µs TimestampType via integer `DIV 1000`
    *    (a double division would lose precision above 2^53 ns) and
    *    `ts_ns` is the native long.
    *  - timestamp[us] (isAdjustedToUTC=false): Spark reads TIMESTAMP_NTZ;
    *    cast to session-TZ TimestampType (exact under the UTC session
    *    every entry point pins) so the public type matches the nanos
    *    branch, and derive `ts_ns = unix_micros(ts) * 1000` for the
    *    µs-arithmetic consumers.
    *
    * Either way the public contract is identical: `ts` TimestampType (µs),
    * `ts_ns` LongType (ns since epoch). The NTZ→LTZ cast does NOT block
    * parquet pushdown: Catalyst's UnwrapCastInBinaryComparison rewrites
    * `cast(ts) < lit` back onto the native column (verified in
    * PlanShapeSpec — PushedFilters carries the ts bound).
    *
    * NOTE: `nanosAsLong` is set session-wide (the key has no per-read
    * option form); it is a no-op for non-nanos files.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanos-encoded: raw long is the nanos value
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => // already session-TZ µs timestamp
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case org.apache.spark.sql.types.TimestampNTZType =>
        // timestamp[us] with isAdjustedToUTC=false; exact cast under UTC
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case other =>
        // a THIRD driver encoding: fail loudly at load (one named error)
        // instead of letting a silent cast null every downstream query —
        // the ContractSpec canary's rule applied to the runtime path
        throw new IllegalStateException(
          s"events.ts has unhandled type $other — teach Tables.events " +
            "this encoding (see the nanos/µs branches)")
    }
  }

  /** True when `frame` bottoms out in a nanos-encoded events scan (the
    * raw `ts` leaf attribute is LongType — see [[events]]'s dispatch).
    * Read off the analyzed plan's leaves, not the public schema: the
    * public `ts` is TimestampType under BOTH encodings by construction.
    */
  private def nanosEncoded(frame: DataFrame): Boolean =
    frame.queryExecution.analyzed.collectLeaves().exists(
      _.output.exists(a => a.name == "ts" &&
        a.dataType == org.apache.spark.sql.types.LongType))

  /** Largest / smallest µs value any Long ts_ns can truncate to:
    * `trunc(Long.MaxValue / 1000)` and its mirror. A µs bound beyond
    * these brackets NOTHING (the empty predicate), which the callers
    * check explicitly — the bound helpers below assume in-range input.
    */
  private val MaxUsTrunc = Long.MaxValue / 1000
  private val MinUsTrunc = Long.MinValue / 1000

  /** Smallest ts_ns with `trunc(ts_ns / 1000) >= a`, for
    * `a <= MaxUsTrunc`. Spark's `DIV` and DuckDB's `//` BOTH truncate
    * toward zero (verified against DuckDB: -5 // 2 = -2), so for a <= 0
    * the bracket widens by 999 BELOW a·1000 — e.g. µs 0 covers ns
    * [-999, 999], not [0, 999]. Saturation at Long.MinValue is exact:
    * it engages only when the true bound sits below every representable
    * ts_ns, where "admit all" is the right answer.
    */
  private def nsLower(a: Long): Long = {
    val c = math.max(a, MinUsTrunc) // below MinUsTrunc ⇒ admit-all anyway
    if (c > 0) c * 1000L // ≤ MaxUsTrunc·1000, representable
    else if (c * 1000L < Long.MinValue + 999L) Long.MinValue
    else c * 1000L - 999L
  }

  /** Largest ts_ns with `trunc(ts_ns / 1000) <= b`, for
    * `b >= MinUsTrunc` — the mirror of [[nsLower]]: for b >= 0 the
    * bracket widens by 999 ABOVE b·1000, saturating exactly at
    * Long.MaxValue.
    */
  private def nsUpper(b: Long): Long = {
    val c = math.min(b, MaxUsTrunc)
    if (c < 0) c * 1000L
    else if (c > (Long.MaxValue - 999L) / 1000L) Long.MaxValue
    else c * 1000L + 999L
  }

  /** Pushdown-eligible timestamp range predicate for [[events]], with
    * bounds stated once, in µs. Dispatches on `e`'s PHYSICAL encoding so
    * the filter reaches parquet row-group stats either way:
    *
    *  - µs-native: predicate on the public `ts` (TimestampType) — reaches
    *    the scan via Catalyst's cast-unwrap (PlanShapeSpec pins it);
    *  - nanos-encoded: `ts` is a computed column (post-scan), so the
    *    predicate is restated on the NATIVE `ts_ns` long with the exact
    *    truncate-toward-zero bounds ([[nsLower]]/[[nsUpper]] — the same
    *    rounding BOTH engines apply, negative-µs-safe, saturating).
    */
  def eventsTsBetween(e: DataFrame, startMicros: Long, endMicros: Long)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit, timestamp_micros}
    if (nanosEncoded(e)) {
      // bounds outside the achievable trunc-µs range (or inverted) have
      // an EMPTY bracket — a saturated bound here would wrongly admit
      // the single extreme ts_ns row
      if (startMicros > MaxUsTrunc || endMicros < MinUsTrunc ||
          startMicros > endMicros) lit(false)
      else col("ts_ns").between(lit(nsLower(startMicros)),
        lit(nsUpper(endMicros)))
    } else
      col("ts").between(timestamp_micros(lit(startMicros)),
        timestamp_micros(lit(endMicros)))
  }

  /** Strict-upper-bound sibling of [[eventsTsBetween]]:
    * `ts_µs < b` ⟺ `ts_ns <= nsUpper(b-1)`; any `b <= MinUsTrunc` is
    * the empty predicate (no representable ts_ns truncates below
    * MinUsTrunc).
    */
  def eventsTsBefore(e: DataFrame, endMicros: Long)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit, timestamp_micros}
    if (nanosEncoded(e)) {
      if (endMicros <= MinUsTrunc) lit(false)
      else col("ts_ns") <= lit(nsUpper(endMicros - 1L))
    } else col("ts") < timestamp_micros(lit(endMicros))
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
