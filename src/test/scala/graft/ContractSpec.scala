package graft

/** Driver-contract safety net:
  *   - every oracle key has a query (a typo'd key would silently skip the
  *     correctness check for that operator);
  *   - every query executes and yields rows at sf0.001 (Verify swallows
  *     per-query exceptions into stderr, so an always-throwing query would
  *     otherwise only surface as a missing output dir);
  *   - column names match between result and what the oracle SELECTs
  *     (the driver hash sorts columns by name — a mismatch fails the gate).
  */
class ContractSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("oracle keys are a subset of query keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query executes with rows > 0 at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf).count()
        spark.catalog.clearCache()
        if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with empty results: $empty")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every side-table an oracle references has a registered dump") {
    val ref = "\\{VERIFY_DIR\\}/([A-Za-z0-9_]+)\\.parquet".r
    val referenced = SparkEntry.oracleSql.values
      .flatMap(sql => ref.findAllMatchIn(sql).map(_.group(1))).toSet
    val missing = referenced -- SparkEntry.sideDumps.keySet
    assert(missing.isEmpty, s"oracles reference undumped side-tables: $missing")
    // and nothing is dumped for no reason (dead cost in Verify)
    val unused = SparkEntry.sideDumps.keySet -- referenced
    assert(unused.isEmpty, s"side dumps no oracle reads: $unused")
  }

  test("every side dump executes with rows > 0 at sf0.001") {
    val empty = SparkEntry.sideDumps.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf).count()
        spark.catalog.clearCache()
        if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty side dumps: $empty")
  }
}
