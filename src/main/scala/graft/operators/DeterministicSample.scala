package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the corpus mix-control primitive
  * (down-weighting an over-represented language/source, carving an eval
  * slice) in reproducible form.
  *
  * `sample()`/`sampleBy()` draw from a partition-seeded RNG: the kept set
  * changes with partitioning, engine, and retry, so a re-run of the
  * pipeline trains on different rows. Here membership is a pure function
  * of the row's stable key — keep iff the first 4 hex digits of
  * md5(key) sort below the stratum's threshold — so any engine, any
  * partitioning, any retry keeps exactly the same rows (and the kept set
  * is NESTED as a stratum's fraction grows: raising 0.25 → 0.5 only adds
  * rows, it never swaps them — the property that lets a mix be tuned
  * without churning the corpus). Granularity is 1/65536, the same
  * hex-prefix scheme as the t7 train/validation/test split.
  */
object DeterministicSample {

  /** Keep each row of `df` with its stratum's fraction (by `stratumCol`
    * string value; `default` for unlisted strata), deciding by
    * `md5(keyCol)` prefix. Fractions clamp to [0, 1]; 1.0 keeps ALL rows
    * (exact, not 65535/65536).
    */
  def stratified(df: DataFrame, keyCol: Column, stratumCol: Column,
      fractions: Map[String, Double], default: Double = 0.0): DataFrame = {
    val raw: Column = fractions.foldLeft(lit(default)) {
      case (acc, (stratum, f)) => when(stratumCol === stratum, lit(f))
        .otherwise(acc)
    }
    // clamp BEFORE the threshold math: floor(negative·65536) formats as an
    // 8-char two's-complement hex string that every 4-char prefix sorts
    // below — an unclamped -0.1 would silently keep ALL rows, the
    // opposite of the intended drop-all
    val frac = least(greatest(raw, lit(0.0)), lit(1.0))
    val h = substring(md5(keyCol.cast("string")), 1, 4)
    // threshold = floor(frac·2¹⁶) as a 4-digit hex string; the f >= 1
    // clause covers keep-all exactly ("%04x" of 65536 is the 5-char
    // "10000", which sorts BELOW "ffff" lexicographically, not above)
    val threshold = format_string("%04x",
      floor(frac * lit(65536.0)).cast("int"))
    df.filter(frac >= 1.0 || h < threshold)
  }
}
