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
  def free(df: DataFrame): Unit =
    df.queryExecution.optimizedPlan match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
