package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable SET-algebra telemetry via theta sketches — the third leg of
  * the sketch portfolio (HLL answers "how many distinct", KLL answers
  * "what value at rank p"; theta answers "how much do two sets
  * OVERLAP"): per-shard sketches of a key column support union,
  * intersection, and difference estimates across any shard combination
  * without rescanning rows. The dedup-planning use at 100 TB: pairwise
  * shingle-set overlap between sources decides which corpora are worth
  * a joint (expensive) cross-source dedup pass and which are disjoint —
  * answered from KB-sized sketch state instead of a corpus² shingle
  * join.
  *
  * Spark 4's built-in DataSketches theta surface does the work
  * (`theta_sketch_agg` / scalar `theta_intersection` /
  * `theta_sketch_estimate`). Below ~2^lgK distinct keys the sketch
  * retains every hash and the estimate is exact; above, relative error
  * ~1/sqrt(2^lgK) (~1.6 % at the default lgK=12). Like KLL, estimates
  * are envelope-checked by SetSketchSpec (theta's sampled mode is not
  * hash-gate reproducible cross-engine), not DuckDB-gated.
  */
object SetSketch {

  /** One row per `shardCols` key with a binary theta sketch `sk` over
    * `keyCol`'s distinct values (parquet-safe; spec pins the
    * round-trip).
    */
  def shardSketches(df: DataFrame, keyCol: String, shardCols: Seq[String],
      lgK: Int = 12): DataFrame = {
    require(shardCols.nonEmpty, "need at least one shard key column")
    require(lgK >= 4 && lgK <= 26, s"lgK $lgK outside DataSketches' [4,26]")
    df.groupBy(shardCols.map(col): _*)
      .agg(expr(s"theta_sketch_agg($keyCol, $lgK)").as("sk"))
  }

  /** Pairwise overlap matrix over single-column shard sketches: one row
    * per unordered shard pair (id_a < id_b) with estimated |A|, |B|,
    * |A∩B| and the Jaccard estimate derived by inclusion-exclusion from
    * the same sketch states. Pair count is |shards|²/2 — shards are
    * GROUPS (sources, days, languages), never rows, so the self-join is
    * a broadcast of KB-sized sketch state.
    */
  def pairwiseOverlap(sketches: DataFrame, idCol: String): DataFrame = {
    val a = sketches.select(col(idCol).as("id_a"), col("sk").as("sk_a"))
    val b = sketches.select(col(idCol).as("id_b"), col("sk").as("sk_b"))
    // theta_sketch_estimate returns BIGINT; double for the ratio math
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("CAST(theta_sketch_estimate(sk_a) AS DOUBLE)").as("n_a"),
        expr("CAST(theta_sketch_estimate(sk_b) AS DOUBLE)").as("n_b"),
        expr("CAST(theta_sketch_estimate(theta_intersection(sk_a, sk_b))" +
          " AS DOUBLE)").as("n_overlap"))
      .withColumn("jaccard_est",
        col("n_overlap") / (col("n_a") + col("n_b") - col("n_overlap")))
  }
}
