package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.queries.Dedup

/** Ingest-time record linkage — the streaming half of dd21: new alias
  * records arrive as a stream and link against the (static, indexed)
  * base table per micro-batch, through the SAME `linkPairs` body the
  * batch gate certifies — one definition of "linked". Linkage is
  * per-alias independent (the base is fixed within a batch), so the
  * operator is STATELESS: no state store, exactly-once falls out of the
  * sink's idempotence on (alias_id, c_custkey), and streamed output ==
  * batch dd21 on the union of micro-batches (StreamingSpec pins it).
  *
  * Deployment shape at 100 TB: the base's exploded segment frame is the
  * serving-side index — materialized once (cell/segment-partitioned
  * parquet, the GeoServing/Serving persistIndex seam) rather than
  * recomputed per batch; each micro-batch explodes only its own aliases
  * (×15) and broadcasts them against it. A base that itself grows takes
  * the IncrementalDedup route: screen new base rows against pending
  * aliases on the same segment keys.
  */
object LinkStream {

  /** Link one micro-batch of aliases `(alias_id, alias)` against the
    * base `(c_custkey, name)` — the foreachBatch body. `maxSegDf`
    * forwards dd2's doc-frequency remedy for low-entropy corpora.
    */
  def linkBatch(base: DataFrame, aliases: DataFrame,
      maxSegDf: Option[Long] = None): DataFrame =
    Dedup.linkPairs(base, aliases, maxSegDf)
}
