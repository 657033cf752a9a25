package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.HashFunctions.{lshBands, minhashSimilarity}
import graft.operators.Checkpoints
import graft.queries.Dedup

/** Ingest-time near-dup PAIR generation — the producer side of the
  * streamed dedup story whose consumer ([[ClusterStream]]) already
  * exists: as documents arrive, each micro-batch is screened against
  * everything already ingested through dd3's exact machinery — the
  * 32-perm MinHash signature ([[Dedup.sigExpr]], one definition with
  * the batch path), 16×2 LSH banding, capped buckets, signature-
  * agreement estimate ≥ 0.5 — and the surviving pairs stream out
  * (straight into a [[ClusterStream.ComponentMap]] via [[maintain]]).
  *
  * The honest incremental contract (NOT bit-equality with batch dd3,
  * which is impossible: the batch bucket cap drops whole buckets by
  * their FINAL size, unknowable mid-stream):
  *
  *  - **no misses**: a bucket whose final size stays ≤ cap is never
  *    truncated, so every batch-dd3 pair is eventually emitted — the
  *    streamed pair set is a SUPERSET of dd3's (StreamingSpec pins
  *    `⊇`, with bit-equal `est_jac` on the intersection);
  *  - **bounded extras**: a bucket that eventually overflows admits
  *    only its first `cap` arrivals (deterministic: arrival order,
  *    doc_id within a batch), so the extras are exactly the pairs the
  *    batch cap suppressed, capped at cap²/2 per hot bucket — never a
  *    flood. A screen biased toward extra CANDIDATES is the right
  *    bias: the downstream exact verifier (dd9 / dd2's re-rank) kills
  *    false positives, while a missed pair is unrecoverable.
  *
  * State = the capped band postings (band, doc_id) plus one signature
  * row per admitted doc — both O(corpus) like any dedup index, 8-byte
  * band keys and 32-long sigs. The state is APPEND-ONLY (round 11; the
  * organic ×50 stream rehearsal showed the per-batch latency creeping
  * 5.5 → 7.9 s because the original form `localCheckpoint`ed the WHOLE
  * unioned state — an O(state) re-materialization per trigger — and
  * semi-joined the full signature store against a full postings
  * distinct): each batch now materializes only ITS OWN admitted rows
  * and newly-covered sigs (O(batch)), held as a list of checkpointed
  * parts that consumers union lazily; every [[PairScreen.CompactEvery]]
  * batches the parts collapse into one frame so the union plan stays
  * shallow (amortized O(state)/K per trigger). Measured effect, stated
  * honestly: at the rehearsal's batch ≈ state/8 ratio the latency
  * curve is UNCHANGED (pairs byte-identical) — there the per-trigger
  * cost is dominated by the candidate-join volume itself, which grows
  * as buckets fill toward cap and IS the product; the rewrite
  * elimination pays where production lives, batch ≪ state (a 31k-row
  * trigger no longer re-materializes a multi-billion-row index). The
  * occupancy aggregate and the candidate/sig joins still SCAN the full
  * (cached) state — map-side-combined partials, batch side broadcast —
  * and the remaining production fix for those is layout, not
  * algorithm: keep the postings as a table BUCKETED by band
  * (source/Bucketed's zero-Exchange contract) and the occupancy
  * aggregate, the admission join, and the candidate join are all
  * exchange-free on the state side. Frames follow the [[Checkpoints]]
  * free-previous discipline.
  */
object NearDupStream {

  /** Cross-batch screen state. Not thread-safe — one foreachBatch or
    * one test loop; [[close]] frees the state blocks.
    *
    * @param cap per-bucket admission cap. The batch pipeline derives
    *   it adaptively (p99.9 of bucket sizes); at ingest time it is a
    *   fixed knob — pass the reference corpus' derived cap (dd3 emits
    *   it as `cap_bucket`), the same previous-release pattern as
    *   IngestPipeline's mixture stats.
    * @param compactEvery parts-compaction period (defaults to the
    *   production [[PairScreen.CompactEvery]]); injectable so
    *   StreamingSpec can drive more batches than the period and pin
    *   pairs + state sizes ACROSS a compaction boundary (ADVICE r11:
    *   the path was otherwise untested at the spec's 3-batch depth).
    */
  final class PairScreen(spark: SparkSession, cap: Int,
      estFloor: Double = 0.5,
      compactEvery: Int = PairScreen.CompactEvery) {
    require(cap >= 1, s"cap $cap must be >= 1")
    require(compactEvery >= 1, s"compactEvery $compactEvery must be >= 1")

    // append-only state: per-batch checkpointed parts, unioned lazily
    // by consumers; compacted every CompactEvery appends so the union
    // plan stays shallow while no trigger rewrites the whole index
    private var postingParts = Vector.empty[DataFrame] // (doc_id, band)
    private var sigParts = Vector.empty[DataFrame] // (doc_id, sig)
    private var appendsSinceCompact = 0

    private def unionOf(parts: Vector[DataFrame]): Option[DataFrame] =
      parts.reduceOption(_ unionByName _)

    private def compactIfDue(): Unit = {
      appendsSinceCompact += 1
      if (appendsSinceCompact >= compactEvery &&
          postingParts.length > 1) {
        val p = unionOf(postingParts).get.localCheckpoint()
        val s = unionOf(sigParts).get.localCheckpoint()
        postingParts.foreach(Checkpoints.free)
        sigParts.foreach(Checkpoints.free)
        postingParts = Vector(p)
        sigParts = Vector(s)
        appendsSinceCompact = 0
      }
    }

    /** Screen one micro-batch of (doc_id, text) rows; returns the
      * emitted pairs (i, j, est_jac), i < j, est ≥ `estFloor`. The
      * returned frame is localCheckpointed — the CALLER owns its
      * blocks ([[maintain]] frees them after the cluster fold).
      * Emission is at-least-once per pair: two docs colliding in TWO
      * bands admitted in different batches re-emit the pair once per
      * such batch — harmless by design, the downstream consumer
      * (union-find / exact re-rank) is idempotent.
      */
    def ingest(docs: DataFrame): DataFrame = {
      val sigs = Dedup.sigsOf(docs).persist()
      try {
        val newBanded = sigs.select(col("doc_id"),
          explode(lshBands(col("sig"), bands = 16, rows = 2)).as("band"))
        // schema-correct empty stand-in on the first batch (band is a
        // struct — deriving the empty frame from the live plan keeps
        // the two in lockstep)
        val oldP = unionOf(postingParts)
          .getOrElse(newBanded.select("doc_id", "band").limit(0))
        // admission: per bucket, old occupancy + this batch's rows in
        // doc_id order fill up to `cap`; later arrivals are turned away
        // (deterministic — re-running the batch admits the same rows)
        val occ = oldP.groupBy("band").agg(count(lit(1)).as("n_old"))
        val admitted = newBanded
          .withColumn("rk", row_number().over(
            Window.partitionBy("band").orderBy("doc_id")))
          .join(occ, Seq("band"), "left")
          .filter(col("rk") + coalesce(col("n_old"), lit(0L)) <= cap)
          .select("doc_id", "band")
          .persist()
        // candidates: new×old plus new×new, normalized to i < j —
        // an old doc may carry a LARGER id than a new one, so the
        // orientation is by id, not by age
        val nb = admitted.select(col("band"), col("doc_id").as("n_id"))
        val newOld = nb.join(oldP.select(col("band"),
            col("doc_id").as("o_id")), "band")
          .select(least(col("n_id"), col("o_id")).as("i"),
            greatest(col("n_id"), col("o_id")).as("j"))
        val newNew = nb.alias("a")
          .join(nb.alias("b"), col("a.band") === col("b.band") &&
            col("a.n_id") < col("b.n_id"))
          .select(col("a.n_id").as("i"), col("b.n_id").as("j"))
        val allSigs = unionOf(sigParts) match {
          case None => sigs
          case Some(st) => st.unionByName(sigs)
        }
        val pairs = newOld.unionByName(newNew).distinct()
          .join(allSigs.select(col("doc_id").as("i"),
            col("sig").as("sig_i")), "i")
          .join(allSigs.select(col("doc_id").as("j"),
            col("sig").as("sig_j")), "j")
          .select(col("i"), col("j"),
            minhashSimilarity(col("sig_i"), col("sig_j")).as("est_jac"))
          .filter(col("est_jac") >= estFloor)
          .localCheckpoint() // eager: stable before the state advances
        // advance state by APPENDING this batch's slice only: admitted
        // postings, and sigs for docs this batch admitted somewhere (a
        // doc admitted nowhere can never pair; docs from EARLIER
        // batches already passed this filter when appended) — O(batch)
        // materialization, never an O(state) rewrite
        val newP = admitted.select("doc_id", "band").localCheckpoint()
        val newS = sigs
          .join(newP.select("doc_id").distinct(), Seq("doc_id"),
            "left_semi")
          .localCheckpoint()
        postingParts :+= newP
        sigParts :+= newS
        compactIfDue()
        admitted.unpersist(blocking = false)
        pairs
      } finally sigs.unpersist(blocking = false)
    }

    /** (postings rows, signature rows) — the screen's live state size,
      * for the scale rehearsal's state-growth curve (runs two count
      * jobs; observability, not the hot path).
      */
    private[graft] def stateSizes: (Long, Long) =
      (unionOf(postingParts).map(_.count()).getOrElse(0L),
        unionOf(sigParts).map(_.count()).getOrElse(0L))

    def close(): Unit = {
      postingParts.foreach(Checkpoints.free)
      sigParts.foreach(Checkpoints.free)
      postingParts = Vector.empty
      sigParts = Vector.empty
      appendsSinceCompact = 0
    }
  }

  object PairScreen {
    /** Compaction period: every this-many appended batches the state
      * parts collapse into one checkpointed frame — keeps the lazy
      * union's plan depth bounded while amortizing the O(state) rewrite
      * to 1/CompactEvery per trigger.
      */
    private[graft] val CompactEvery = 32
  }

  /** The full ingest-time near-dup path: each micro-batch of documents
    * screens into pairs, and the pairs fold straight into the cluster
    * map — docs in, current duplicate clusters out.
    */
  def maintain(docs: DataFrame, screen: PairScreen,
      clusters: ClusterStream.ComponentMap): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val pairs = screen.ingest(batch)
        try clusters.ingest(pairs.select("i", "j"))
        finally Checkpoints.free(pairs)
      }
      .outputMode("update")
      .start()
}
