package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Dedup, GridQueries, MultimodalQueries, Profiling, Relational, Similarity, Text}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * north-star LLM-pipeline operator) expressed Spark-first over the
  * driver-provided parquet tables; [[oracleSql]] carries the equivalent
  * ANSI SQL the driver runs in DuckDB for the hash-match correctness gate.
  * Column names/aliases are kept identical on both sides (the driver sorts
  * columns by name before hashing).
  *
  * Query modules (each file is one capability area):
  *   - [[graft.queries.Relational]] — scans, filters, joins, windows, set
  *     ops, aggregates, scalar functions (SURVEY §2.2-2.7)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * g1 runs the engine's identity operator — join-mode multilinear
    * interpolation — end-to-end (bucketed series → locate → corner join →
    * weighted aggregation).
    */
  def entry(spark: SparkSession): DataFrame = {
    val sf = "/root/testdata/sf0.001"
    queries("g1_interp_1d")(spark, sf)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Text.queries ++ Dedup.queries ++
      Similarity.queries ++ MultimodalQueries.queries ++
      GridQueries.queries ++ Profiling.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. SQL may
    * reference `{VERIFY_DIR}` — Verify substitutes the absolute dump dir so
    * the oracle can read the signature side-tables (see [[sideDumps]]).
    */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ Text.oracleSql ++ Dedup.oracleSql ++
      Similarity.oracleSql ++ MultimodalQueries.oracleSql ++
      GridQueries.oracleSql ++ Profiling.oracleSql

  /** Queries whose answer (or a corpus-sized intermediate of it) is
    * served from a session memo after its first computation — the rows
    * whose memo-on bench numbers time a LocalRelation replay, not the
    * pipeline. Bench runs exactly these a second time under the
    * raw-measurement switch and reports both columns (VERDICT r8 ask
    * #2), so per-query numbers stay round-over-round comparable
    * without losing the compute-once story.
    */
  def memoizedQueries: Set[String] =
    Similarity.memoizedNames ++ Dedup.memoizedNames ++
      MultimodalQueries.memoizedNames ++ Text.memoizedNames

  /** Signature side-tables for the sketch queries: Spark-computed frames
    * (xxhash64-based, not recomputable in DuckDB) that Verify dumps as
    * parquet so the oracle SQL can replay the downstream pipeline —
    * banding, bucket join, re-rank — from them. Keyed by dump-file stem.
    */
  def sideDumps: Map[String, (SparkSession, String) => DataFrame] =
    Dedup.sideDumps ++ Similarity.sideDumps ++ MultimodalQueries.sideDumps
}
