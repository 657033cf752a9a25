package graft.queries

import org.apache.spark.sql.DataFrame

/** Cache discipline for queries that persist large intermediates.
  *
  * The intermediates (shingle arrays, signatures, normalized vectors, grid
  * frames) are persisted as materialization barriers: without them Catalyst's
  * project-collapse would inline the expensive kernel expressions into the
  * downstream self-joins and recompute them per *pair* instead of per *row*
  * (measured 80 s → 2 s on dd3 at sf0.1). But cache substitution happens at
  * action time, so an intermediate cannot be released until every action that
  * needs it has run — a bare `try/finally` around the plan construction would
  * drop the cache before the caller materializes the result and silently
  * reintroduce the per-pair recompute.
  *
  * [[resultThenRelease]] therefore materializes the (small, bounded) result
  * into its own cache first and only then releases the intermediates. The
  * caller receives a cached result it owns — the one retained block — while
  * the corpus-sized intermediates are freed deterministically inside the
  * query call instead of leaking until some external `clearCache()`. Plan
  * evidence is preserved: `InMemoryRelation` prints the full cached child
  * plan, so the no-nested-loop pins in PlanShapeSpec/RangeJoinSpec still see
  * the real join shapes through the cache.
  */
private[graft] object QueryCache {

  /** True when the session asks the QUERY-RESULT memos (dd pair list /
    * cluster map, pHash artifacts, ANN tier shortlists) to stand down
    * so every run executes its raw pipeline end-to-end — the honest
    * per-query measurement switch (Bench maps SPARK_GRAFT_NO_MEMO=1
    * onto this conf). TRAINED-ARTIFACT memos (k-means centroids, BPE
    * merge tables) are deliberately NOT covered: those memoize an
    * input a production pipeline loads from storage, not the work the
    * gated query is measured on.
    */
  def memoDisabled(s: org.apache.spark.sql.SparkSession): Boolean =
    s.conf.getOption("spark.graft.memo.disabled").contains("true")

  /** Persist and fully materialize `result`, then release the
    * `intermediates` it was computed from. Results here are bounded (top-k
    * lists, pair survivors, probe rows — never corpus-sized), so caching
    * them is cheap; `count()` on a persisted frame materializes every
    * column into the cache (unlike on a bare plan, where Catalyst would
    * prune the projections).
    */
  def resultThenRelease(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val out = result.persist()
    // failure path: if materialization dies (task failure, OOM, cancel),
    // release BOTH the half-built result cache and the intermediates before
    // rethrowing — otherwise a failed query leaks exactly the corpus-sized
    // caches this class exists to free
    try out.count()
    catch {
      case e: Throwable =>
        out.unpersist(blocking = false)
        intermediates.foreach(_.unpersist(blocking = false))
        throw e
    }
    intermediates.foreach(_.unpersist(blocking = false))
    out
  }

  /** Lineage CUT for bounded results computed from storage that is about
    * to disappear (temp catalog tables, temp files): collect to the
    * driver and rebuild as a local frame. A `persist()` would NOT be
    * safe here — DROP TABLE cascades an uncache of every dependent plan,
    * and a later action would silently recompute from the deleted files.
    * Only for results bounded by construction (group-by over a small
    * categorical domain); never corpus-sized frames.
    */
  def materializeLocal(result: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import scala.jdk.CollectionConverters._
    result.sparkSession
      .createDataFrame(result.collect().toSeq.asJava, result.schema)
  }
}
