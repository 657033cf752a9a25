package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable quantile telemetry via KLL sketches — the rank-space
  * sibling of dd13's HLL cardinality contract: sketch once at SHARD
  * granularity, answer any coarser rollup by merging sketch STATE, never
  * rescanning rows. The 100 TB use: per-(day, source) value sketches are
  * a few KB each; p50/p95/p99 per source, per day, or globally all come
  * from sketch merges — where an exact `percentile` is a full sort/scan
  * of every row each time the grouping changes.
  *
  * Spark 4's built-in DataSketches KLL aggregates do the heavy lifting
  * (`kll_sketch_agg_double` / `kll_merge_agg_double` /
  * `kll_sketch_get_quantile_double` — codegen'd typed aggregates, ~3 KB
  * state at k=200, normalized rank error ≈ 1.65 %). Unlike HLL, KLL
  * state is NOT insertion/merge-order invariant, so estimates can differ
  * at the last ulp between runs — this operator is therefore verified by
  * QuantileSketchSpec's rank-error envelope (the CMS precedent), not the
  * DuckDB hash gate.
  */
object QuantileSketch {

  /** Per-shard sketches of `valueCol`: one row per `shardCols` key with a
    * binary KLL sketch column `sk` — the persisted telemetry artifact
    * (parquet-safe; QuantileSketchSpec pins the round-trip).
    */
  def shardSketches(df: DataFrame, valueCol: String,
      shardCols: Seq[String], k: Int = 200): DataFrame = {
    require(shardCols.nonEmpty, "need at least one shard key column")
    df.groupBy(shardCols.map(col): _*)
      .agg(expr(s"kll_sketch_agg_double($valueCol, $k)").as("sk"))
  }

  /** Roll shard sketches up to `groupCols` (a subset of the shard key —
    * empty = global) and read the `probs` quantiles out of the merged
    * state. Returns groupCols + `qs` (array<double>, one per prob).
    */
  def rollupQuantiles(sketches: DataFrame, groupCols: Seq[String],
      probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      s"probs must be in [0,1]: $probs")
    val q = expr(s"kll_sketch_get_quantile_double(" +
      s"kll_merge_agg_double(sk), array(${probs.mkString(",")}))").as("qs")
    if (groupCols.isEmpty) sketches.agg(q)
    else sketches.groupBy(groupCols.map(col): _*).agg(q)
  }
}
