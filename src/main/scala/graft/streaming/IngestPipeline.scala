package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Checkpoints
import graft.queries.{Dedup, Text}

/** The flagship batch pipeline (p8: quality → repetition rules →
  * benchmark decontamination → exact dedup → temperature mixture →
  * split accounting) run AT INGEST TIME over a document stream — the
  * composed streaming twin that turns the per-stage streaming pieces
  * (dd10's stream decontamination, p9's incremental dedup, the
  * stateless sampling stages) into one curation operator.
  *
  * Stage-for-stage it calls the SAME `private[graft]` helpers the
  * gated p8 composes ([[Text.repCleanDocs]], [[Text.exactDedupMeta]],
  * [[Text.mixtureSurvivors]], [[Text.splitAccounting]]), so stream and
  * batch cannot disagree on any stage's arithmetic. What changes is
  * only what MUST change at ingest:
  *
  *  - exact dedup becomes incremental: each batch's in-batch winners
  *    screen against the accumulated corpus key set (p9's contract);
  *    the winner for a text seen in several batches is its FIRST
  *    batch's min doc_id — arrival-order semantics, equal to the batch
  *    pipeline's global min when ingestion is id-ordered (the parity
  *    spec's setup; out-of-order arrival keeps an earlier-arrived
  *    larger id, exactly what a real at-ingest dedup does);
  *  - the mixture thresholds come from a REFERENCE (lang, n_lang)
  *    stats frame — previous release or rolling estimate — because the
  *    final corpus totals are unknowable mid-stream (DriftStream's
  *    reference-histogram pattern);
  *  - the split accounting ACCUMULATES: per-batch bounded
  *    (split, lang) partials fold into a driver map by addition (the
  *    counts are pure sums, so batch boundaries cannot move them).
  *
  * Scale shape: every per-batch stage is batch-bounded (quality/
  * repetition/decontamination are per-doc; the eval shingle set
  * broadcasts); the one state that grows is the corpus KEY set —
  * 16-byte md5 keys, the same table p9 maintains, bucketed-by-key in
  * production so only the batch side of the anti-join moves. Key-set
  * frames follow the [[Checkpoints]] free-previous discipline; the
  * accounting state is O(|splits|·|langs|).
  */
object IngestPipeline {

  /** One curation pipeline's cross-batch state. Not thread-safe —
    * drive from one foreachBatch (batches run serially) or one test
    * loop; [[close]] frees the key-set blocks.
    *
    * @param evalDocs static benchmark slice (doc_id, text) to
    *   decontaminate against — broadcast per batch.
    * @param refStats reference (lang, n_lang) mixture stats.
    */
  final class Curation(spark: SparkSession, evalDocs: DataFrame,
      refStats: DataFrame) {

    private var keys: Option[DataFrame] = None // (tk), localCheckpointed
    private val acct = mutable.Map.empty[(String, String), (Long, Long)]

    /** Fold one micro-batch of (doc_id, lang, text) rows. */
    def ingest(batch: DataFrame): Unit = {
      val rep = Text.repCleanDocs(batch).persist()
      try {
        val flagged = Dedup
          .decontaminate(rep.select("doc_id", "text"), evalDocs, 3)
          .select(col("train_id").as("doc_id")).distinct()
        val clean = rep.join(flagged, Seq("doc_id"), "left_anti")
        // in-batch winners, then the incremental screen vs everything
        // already ingested (the p9 anti-join; Bloom pre-screen applies
        // at scale — exactness is unaffected either way)
        val winners = Text.exactDedupMeta(clean)
        val novel = (keys match {
          case None => winners
          case Some(k) => winners.join(k, Seq("tk"), "left_anti")
        }).persist()
        // the ONLY rows read twice: the bounded accounting partials and
        // the 16-byte keys — novel itself is batch-bounded
        val mixed = Text.mixtureSurvivors(novel, refStats)
        Text.splitAccounting(mixed).collect().foreach { r =>
          val key = (r.getString(0), r.getString(1))
          val (n0, t0) = acct.getOrElse(key, (0L, 0L))
          acct(key) = (n0 + r.getLong(2), t0 + r.getLong(3))
        }
        val nk = (keys match {
          case None => novel.select("tk")
          case Some(k) => k.unionByName(novel.select("tk"))
        }).localCheckpoint()
        keys.foreach(Checkpoints.free)
        keys = Some(nk)
        novel.unpersist(blocking = false)
      } finally rep.unpersist(blocking = false)
    }

    /** The cumulative (split, lang, n_docs, sum_tokens) accounting —
      * the stream's live answer to p8's gated frame.
      */
    def accounting: DataFrame = {
      import spark.implicits._
      acct.toSeq.map { case ((sp, lg), (n, t)) => (sp, lg, n, t) }
        .toDF("split", "lang", "n_docs", "sum_tokens")
    }

    /** Corpus keys ingested so far (the p9 screen table). */
    def corpusKeys: DataFrame = keys.getOrElse {
      import spark.implicits._
      Seq.empty[String].toDF("tk")
    }

    def close(): Unit = { keys.foreach(Checkpoints.free); keys = None }
  }

  /** Wire a streaming (doc_id, lang, text) frame into `state`. */
  def maintain(docs: DataFrame, state: Curation): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => state.ingest(batch) }
      .outputMode("update")
      .start()
}
