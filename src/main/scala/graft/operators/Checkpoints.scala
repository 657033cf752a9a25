package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block-storage bookkeeping for eager `localCheckpoint` iteration (the
  * O(1)-per-round loop pattern of [[ConnectedComponents]] and
  * [[PageRank]]): a checkpointed round's plan is a flat [[LogicalRDD]]
  * over materialized blocks, which `spark.catalog.clearCache` does NOT
  * free (RDD-level storage, not CacheManager entries) — intermediate
  * rounds must be unpersisted explicitly.
  */
private[graft] object Checkpoints {

  /** Free the block storage behind a localCheckpointed frame. After this
    * the frame is unrecoverable (lineage was truncated) — only call on
    * rounds no later plan references.
    */
  def free(df: DataFrame): Unit = {
    // look through projections: a checkpoint-returning operator may
    // narrow its public schema (ConnectedComponents drops its internal
    // convergence column), and the owner must still be able to free the
    // blocks underneath. Only Project is traversed — anything deeper
    // (joins, aggregates) means the frame no longer OWNS the checkpoint
    // and freeing it from here would yank blocks out from under other
    // references.
    def loop(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Unit = p match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project =>
        loop(pr.child)
      case _ => ()
    }
    loop(df.queryExecution.optimizedPlan)
  }
}
