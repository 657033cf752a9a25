package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.queries.Text

/** Ingest-time k-anonymity monitoring — the streaming half of p21: as
  * documents stream in, per-quasi-identifier-class counts ride in
  * `mapGroupsWithState` (one state row per (lang, source, len_bucket)
  * class — state bounded by the QI DOMAIN, independent of stream
  * volume), and after any micro-batch the live counts score through the
  * SAME verdict arithmetic the batch release gate certifies
  * ([[Text.kAnonymityVerdicts]] — one definition of "at risk"). This is
  * the release-readiness dashboard a continuously-ingesting corpus
  * needs: a class leaves the at-risk set the moment its 5th member
  * lands, without rescanning what already landed.
  *
  * Deployment shape at 100 TB/day: the class shuffle is the only wide
  * edge and carries ≤ |QI domain| keys; counts are monotone
  * non-decreasing under ingest, so update-mode's latest row per class
  * (= the max, as [[audit]] folds) is the live census. Deletion-capable
  * pipelines would switch the state update to a signed delta — the
  * verdict arithmetic is unchanged.
  */
object PrivacyStream {

  /** One quasi-identifier equivalence class (p21's release metadata). */
  final case class QiKey(lang: String, source: String, lenBucket: Long)

  /** Live per-class state: the class and its running document count. */
  final case class QiCount(lang: String, source: String, lenBucket: Long,
      n: Long)

  /** Stateful per-class running counts over a stream of QI keys
    * (callers bucket with p21's `n_chars DIV 100` so stream and batch
    * classify identically). One state row per class, NoTimeout — a
    * release gate's classes are never evicted while the release is
    * open.
    */
  def classCounts(keys: Dataset[QiKey]): Dataset[QiCount] = {
    import keys.sparkSession.implicits._
    keys.groupByKey(identity)
      .mapGroupsWithState[QiCount, QiCount](GroupStateTimeout.NoTimeout) {
        (key, batch, state) =>
          val n = state.getOption.map(_.n).getOrElse(0L) + batch.size
          val next = QiCount(key.lang, key.source, key.lenBucket, n)
          state.update(next)
          next
      }
  }

  /** Fold the accumulated update-mode output to its latest row per
    * class (counts are monotone, so latest = max) and run the
    * batch-certified verdict arithmetic: the live p21 report.
    */
  def audit(latest: DataFrame): DataFrame =
    Text.kAnonymityVerdicts(
      latest.groupBy(col("lang"), col("source"),
          col("lenBucket").as("len_bucket"))
        .agg(max(col("n")).as("n_docs")))
}
