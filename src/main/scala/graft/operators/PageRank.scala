package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed PageRank by power iteration over an edge DataFrame —
  * the iterative-graph-compute operator class (importance scoring over
  * link/transition/citation graphs; the web-scale ancestor of the
  * dedup cluster propagation in [[ConnectedComponents]]).
  *
  * Input `edges(src, dst, w)` with positive weights; returns
  * `(node, rank)` for every node appearing as a src or dst, with
  * `sum(rank) = 1` (up to float association).
  *
  * Semantics (the classic formulation):
  * `rank₀ = 1/N`;
  * `rankₜ₊₁(v) = (1-d)/N + d·(Σ_{u→v} rankₜ(u)·w(u,v)/outw(u) + dangₜ/N)`
  * where `dangₜ` is the summed rank of dangling nodes (no out-edges),
  * redistributed uniformly so rank mass is conserved.
  *
  * 100 TB design: every per-iteration step is a keyed shuffle bounded by
  * |nodes| or |edges| — no collect of either. The normalized edge frame
  * is computed ONCE (transition probability via a window over `src` —
  * one shuffle, no self-join) and persisted; each iteration's rank frame
  * ends in an eager `localCheckpoint` — NOT a plain persist, which
  * caches data but leaves the logical plan nesting one join deeper per
  * round, and re-analysis of that growing tree came to dominate runtime
  * (measured: iteration 8 took 5.8 s where iteration 1 took 1.1 s; the
  * same pathology [[ConnectedComponents]] documents). The previous
  * round's blocks are freed as soon as the next round materializes, so
  * storage is O(1) rounds. The only driver-side value per iteration is
  * one scalar (the dangling mass — an agg over a semi-join pruned
  * frame); with no dangling nodes that action is skipped entirely,
  * leaving ONE job per iteration. Convergence control is a fixed
  * iteration count: deterministic, replayable by a SQL oracle, and the
  * standard choice for batch rank pipelines (10 iterations ≈ 1e-3
  * relative residual on web-ish graphs).
  *
  * The RETURNED frame is localCheckpointed and its blocks are owned by
  * the caller — `spark.catalog.clearCache` does not free them (see
  * [[Checkpoints]]); same contract as [[ConnectedComponents]].
  */
object PageRank {

  /** @param requireFullDegree when true, throw if any node lacks an
    *   out-edge (dangling) or an in-edge. The engine handles both
    *   correctly; a SQL-oracle replay of the recursive-CTE form cannot
    *   (single recursive reference — no dangling term, inner-join drops
    *   in-edge-less nodes), so an oracled query instance opts into a LOUD
    *   named failure on a data regeneration that introduces either,
    *   instead of a silent hash mismatch. Costs two tiny anti-join probes
    *   over frames the setup already built.
    */
  def run(edges: DataFrame, damping: Double = 0.85, iters: Int = 10,
      requireFullDegree: Boolean = false): DataFrame = {
    require(damping > 0 && damping < 1, s"damping $damping outside (0,1)")
    require(iters >= 1, s"iters $iters must be >= 1")
    // per-edge transition probability, the only frame iterations re-scan
    val norm = edges
      .withColumn("p", col("w") /
        sum("w").over(Window.partitionBy("src")))
      .select(col("src"), col("dst"), col("p"))
      .persist()
    val nodes = norm.select(col("src").as("node"))
      .union(norm.select(col("dst").as("node")))
      .distinct()
      .persist()
    val n = nodes.count().toDouble // materializes both persists
    // dangling = appears only as dst. Computed once; per-iteration only
    // its (usually zero) rank mass is re-aggregated.
    val dangling = nodes
      .join(norm.select(col("src").as("node")).distinct(), Seq("node"), "left_anti")
      .persist()
    val anyDangling = dangling.limit(1).count() > 0
    if (requireFullDegree) {
      require(!anyDangling,
        "dangling node (no out-edges) present — the caller's SQL oracle " +
          "cannot replay the dangling-mass term; re-derive the graph or " +
          "drop requireFullDegree")
      val noIn = nodes.join(
        norm.select(col("dst").as("node")).distinct(), Seq("node"), "left_anti")
      require(noIn.limit(1).count() == 0,
        "node with no in-edges present — the recursive-CTE oracle's inner " +
          "join would drop it; re-derive the graph or drop requireFullDegree")
    }

    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
      .localCheckpoint() // eager
    var done = false
    try {
      for (_ <- 1 to iters) {
        val dang =
          if (!anyDangling) 0.0
          else ranks.join(dangling, Seq("node"), "left_semi")
            .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
        val contrib = norm
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("rank") * col("p")).as("contrib"))
        val next = nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit((1 - damping) / n) + lit(damping) *
              (coalesce(col("contrib"), lit(0.0)) + lit(dang / n)))
              .as("rank"))
          .localCheckpoint() // eager: materializes + flattens the plan
        Checkpoints.free(ranks)
        ranks = next
      }
      done = true
      ranks
    } finally {
      norm.unpersist()
      nodes.unpersist()
      dangling.unpersist()
      // a mid-loop failure must not leak the current round's checkpoint
      // blocks (clearCache can't free them — see Checkpoints); on success
      // the final frame's blocks are the caller's, like dd8's contract
      if (!done) Checkpoints.free(ranks)
    }
  }
}
