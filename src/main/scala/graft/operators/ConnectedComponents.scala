package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the cluster-formation
  * primitive behind near-dup dedup ("keep one document per duplicate
  * cluster"): every node is labeled with the smallest node id reachable
  * through the (undirected) edges.
  *
  * Algorithm: Pregel-style min-label propagation. Each round joins the
  * edge list against the current labels and takes the per-node min of the
  * neighbors' labels; labels converge in ≤ component-diameter rounds.
  * Near-dup clusters are near-cliques (diameter 1-2), so the loop is
  * short; the stop condition is an `isEmpty` convergence probe, and
  * exceeding `maxIter` throws rather than returning silently-truncated
  * labels. Each round costs one shuffled equi-join +
  * one hash aggregation over the *edge list* — never the corpus — and the
  * per-round result is re-persisted so lineage stays flat across
  * iterations. For billion-edge, high-diameter graphs the
  * large-star/small-star formulation halves round counts; dedup pair
  * graphs don't need it.
  */
object ConnectedComponents {

  /** Label every node of the undirected graph `pairs(src, dst)` with its
    * component's minimum node id. Returns (node, label). Only nodes
    * incident to an edge appear (isolated corpus docs are their own
    * trivial cluster by definition — callers left-join if they need them).
    */
  def components(pairs: DataFrame, src: String, dst: String,
      maxIter: Int = 12): DataFrame = {
    val p = pairs.select(col(src).as("i"), col(dst).as("j"))
    val edges = p.union(p.select(col("j").as("i"), col("i").as("j"))).persist()
    // materialize before the loop: the union references `p` twice and the
    // loop references `edges` every round — an unpopulated cache would let
    // the first job race both union branches through the full upstream
    // DAG (measured 3× the pair-computation cost on dd8)
    edges.count()
    var labels = edges.select(col("i").as("node")).distinct()
      .withColumn("label", col("node"))
      .persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels, edges("j") === labels("node"))
        .groupBy(edges("i").as("node"))
        .agg(min("label").as("nbr_label"))
      val next = labels.alias("l")
        .join(nbrMin.alias("n"), col("l.node") === col("n.node"), "left")
        .select(col("l.node").as("node"),
          least(col("l.label"),
            coalesce(col("n.nbr_label"), col("l.label"))).as("label"))
        .persist()
      // full count (not isEmpty): the probe must consume every partition
      // of next so the cache is fully populated BEFORE the previous
      // round's cache is dropped — a short-circuiting probe would leave
      // next partially cached and later rounds recomputing through the
      // whole chain of dropped prior rounds. One job does both the
      // materialization and the convergence decision.
      converged = next.alias("a")
        .join(labels.alias("b"), col("a.node") === col("b.node"))
        .filter(col("a.label") =!= col("b.label"))
        .count() == 0
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    // fail loudly: truncated propagation would silently mislabel every
    // node of a deeper-than-maxIter component (and fail any exact check
    // downstream in a way that looks like a different bug)
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge within $maxIter rounds — " +
        "component diameter exceeds maxIter; raise it for this graph")
    labels
  }
}
