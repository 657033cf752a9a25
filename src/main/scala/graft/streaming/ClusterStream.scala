package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Checkpoints, ConnectedComponents}

/** Streaming near-dup CLUSTER maintenance — the ingest-time twin of
  * dd8 (VERDICT r8 ask #3), completing the story p9 (incremental
  * exact dedup) + dd2/dd8 (batch near-dup) start: as ingest produces
  * new near-dup PAIRS, the cluster map that canonical-pick (dd14) and
  * keep-lists consume goes stale; this operator folds each
  * micro-batch of pairs into the component map incrementally, so the
  * map is always current without re-running the global propagation.
  *
  * Incremental union-find, frame-shaped. The state is the dd8 map
  * itself — `(node, label)` with label = the component's min node id
  * — and each batch of edges merges AT THE LABEL LEVEL:
  *
  *   1. lift: each batch endpoint maps through the current labels
  *      (left join; an unseen node lifts to itself);
  *   2. propagate: [[ConnectedComponents]] runs on the LIFTED edge
  *      list — a graph over touched labels + new nodes, bounded by
  *      the BATCH size, never the corpus;
  *   3. relabel: the tiny (≤ 2·|batch| rows) old→new label table
  *      broadcast-joins the map, and new nodes append.
  *
  * min-labels compose associatively (the merged label is the min over
  * merged components' mins = the global min), so the maintained map is
  * EQUAL — not approximately, hash-equal — to batch dd8's
  * ConnectedComponents over the union of all pairs ever ingested,
  * whatever the batch boundaries, arrival order, or re-delivery
  * (duplicate edges merge already-merged components: a no-op).
  * StreamingSpec pins exactly that, re-delivery included.
  *
  * Scale shape at 100 TB:
  *  - per-batch propagation cost is O(|batch| · rounds) — the corpus
  *    never re-enters the loop;
  *  - the relabel side is bounded by labels touched this batch →
  *    broadcast; the map-side join is shuffle-free;
  *  - the lift join is batch-keyed against the map: with the map
  *    bucketed by node (source/Bucketed's layout), only the batch
  *    moves. The full-map rewrite per batch is the driver-loop
  *    simplification here; a production deployment keeps the map as
  *    a bucketed table plus an old→new REDIRECT sidecar (union-find
  *    path compression as data), compacting on a cadence instead of
  *    rewriting per trigger — the emitted labels are identical.
  *
  * State frames follow the [[Checkpoints]] discipline: each updated
  * map ends in an eager `localCheckpoint` (the plan would otherwise
  * nest two joins deeper per batch — the r6 lesson) and the previous
  * batch's blocks are freed as soon as the new map materializes.
  */
object ClusterStream {

  /** The maintained `(node, label)` map. Not thread-safe — drive it
    * from one streaming query (foreachBatch runs batches serially) or
    * one test loop. Call [[close]] (or keep the final [[snapshot]] and
    * free it via Checkpoints) when done; blocks are session-lived
    * otherwise.
    */
  final class ComponentMap(spark: SparkSession) {
    private var cur: Option[DataFrame] = None

    /** The current map — `(node, label)`, label = min id reachable so
      * far. Empty frame before any edge arrives. The returned frame is
      * valid until the NEXT [[ingest]] (its blocks are then freed).
      */
    def snapshot: DataFrame = cur.getOrElse {
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("node", "label")
    }

    /** Fold one batch of undirected pairs `(i, j)` into the map. */
    def ingest(pairs: DataFrame): Unit = {
      val e = pairs.select(col("i"), col("j")).filter(col("i") =!= col("j"))
      if (e.isEmpty) return
      cur match {
        case None =>
          cur = Some(ConnectedComponents.components(e, "i", "j"))
        case Some(m) =>
          // 1. lift endpoints through the current labels
          val lifted = e
            .join(m.select(col("node").as("i"), col("label").as("li")),
              Seq("i"), "left")
            .join(m.select(col("node").as("j"), col("label").as("lj")),
              Seq("j"), "left")
            .select(coalesce(col("li"), col("i")).as("a"),
              coalesce(col("lj"), col("j")).as("b"))
            // both endpoints already share a component → nothing merges
            .filter(col("a") =!= col("b"))
          if (lifted.isEmpty) return
          // 2. propagate over the batch-bounded label graph
          val comp = ConnectedComponents.components(lifted, "a", "b")
          // 3. relabel the map (broadcast: ≤ 2·|batch| rows) + append
          // nodes first seen this batch. An old label L is itself a
          // node with (L, L) in the map, so "new node" = not in the map.
          val newNodes = comp.join(
            m.select(col("node")), Seq("node"), "left_anti")
          val next = m.alias("m")
            .join(broadcast(comp.alias("r")),
              col("m.label") === col("r.node"), "left")
            .select(col("m.node").as("node"),
              coalesce(col("r.label"), col("m.label")).as("label"))
            .unionByName(newNodes)
            .localCheckpoint()
          Checkpoints.free(m)
          Checkpoints.free(comp)
          cur = Some(next)
      }
    }

    /** Free the map's checkpoint blocks. */
    def close(): Unit = { cur.foreach(Checkpoints.free); cur = None }
  }

  /** Wire a streaming `(i, j)` pair frame into `state`. foreachBatch —
    * the cross-key iterative merge cannot be a keyed state op, and
    * batches must fold serially (exactly what foreachBatch guarantees).
    */
  def maintain(pairs: DataFrame, state: ComponentMap): StreamingQuery =
    pairs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => state.ingest(batch) }
      .outputMode("update")
      .start()
}
