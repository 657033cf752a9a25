package graft.operators

import org.apache.spark.sql.DataFrame
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
  * is computed ONCE and persisted (iterations re-read it, not the raw
  * edges), each iteration's rank frame is persisted and the previous one
  * released, so lineage stays one-iteration deep (no exponential replay
  * at iteration 10). The only driver-side values per iteration are two
  * scalars (the dangling mass — an `agg` over a semi-join pruned frame —
  * and nothing else); with no dangling nodes that action is skipped
  * entirely, leaving ONE job per iteration. Convergence control is a
  * fixed iteration count: deterministic, replayable by a SQL oracle, and
  * the standard choice for batch rank pipelines (10 iterations ≈ 1e-3
  * relative residual on web-ish graphs).
  */
object PageRank {

  def run(edges: DataFrame, damping: Double = 0.85, iters: Int = 10)
      : DataFrame = {
    require(damping > 0 && damping < 1, s"damping $damping outside (0,1)")
    require(iters >= 1, s"iters $iters must be >= 1")
    val outw = edges.groupBy("src").agg(sum("w").as("tw"))
    // per-edge transition probability, the only frame iterations re-scan
    val norm = edges.join(outw, "src")
      .select(col("src"), col("dst"), (col("w") / col("tw")).as("p"))
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

    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank")).persist()
    ranks.count()
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
        .persist()
      next.count()
      ranks.unpersist()
      ranks = next
    }
    norm.unpersist()
    nodes.unpersist()
    dangling.unpersist()
    ranks
  }
}
