package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-memory frequent-items candidate generation (Misra–Gries).
  *
  * The scale problem: "which n-grams / URLs / keys occur ≥ φ·N times?"
  * over a key domain too large to hash-aggregate (every distinct 5-gram of
  * a 100 TB corpus). A plain `groupBy(key).count` shuffles the FULL key
  * domain; the two-pass heavy-hitter pattern shuffles O(m) keys total:
  *
  *   pass 1  — this aggregator: each partition keeps at most `m` counters
  *             (Misra–Gries summaries are mergeable: Agarwal et al.,
  *             "Mergeable Summaries", PODS 2012); the merged summary's
  *             keys are the CANDIDATES. Undercount is ≤ N/(m+1), so every
  *             key with true count > N/(m+1) survives — with threshold
  *             T > N/(m+1) the candidate set provably contains ALL true
  *             heavy hitters.
  *   pass 2  — exact counts for candidates only (broadcast the ≤ m keys,
  *             semi-join the scan, tiny groupBy), filter count ≥ T.
  *
  * The FINAL output is exact and deterministic whatever the candidate
  * set looked like (any superset of the true heavy hitters yields the
  * same pass-2 result), which is what lets the sketch sit under the
  * DuckDB hash gate: the oracle is the plain GROUP BY … HAVING.
  *
  * Buffer is a key→count map capped at 2m entries; on overflow the
  * (m+1)-th largest count δ is subtracted from every counter and ≤ m
  * survive. Each such step destroys ≥ (m+1)·δ mass (the top m+1 counters
  * each lose δ), so Σδ ≤ N/(m+1) — the classic MG bound, preserved under
  * merge-then-compact.
  */
class MisraGries(m: Int) extends Aggregator[String, mutable.Map[String, Long], Seq[String]] {
  require(m >= 1, s"m=$m must be >= 1")

  def zero: mutable.Map[String, Long] = mutable.Map.empty

  private def compact(buf: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    if (buf.size <= 2 * m) return buf
    val counts = buf.values.toArray
    java.util.Arrays.sort(counts)
    val delta = counts(counts.length - (m + 1)) // (m+1)-th largest
    val out = mutable.Map.empty[String, Long]
    buf.foreach { case (k, c) => if (c > delta) out(k) = c - delta }
    out
  }

  def reduce(buf: mutable.Map[String, Long], key: String): mutable.Map[String, Long] = {
    if (key != null) {
      buf.update(key, buf.getOrElse(key, 0L) + 1L)
      compact(buf)
    } else buf
  }

  def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foreach { case (k, c) => big.update(k, big.getOrElse(k, 0L) + c) }
    compact(big)
  }

  /** Candidate keys — a FINAL compaction settles the buffer to ≤ m
    * entries (the working buffer runs up to 2m between compactions), so
    * the published candidate set honors the ≤ m contract the pass-2
    * broadcast is sized for. The extra compaction destroys ≥ (m+1)·δ
    * mass like every other one, so Σδ ≤ N/(m+1) still holds and no key
    * above the bound can be lost here. Sorted for a stable dump.
    */
  def finish(buf: mutable.Map[String, Long]): Seq[String] = {
    val settled =
      if (buf.size <= m) buf
      else {
        val counts = buf.values.toArray
        java.util.Arrays.sort(counts)
        val delta = counts(counts.length - (m + 1))
        buf.filter { case (_, c) => c > delta }
      }
    settled.keys.toSeq.sorted
  }

  def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    ExpressionEncoder[mutable.Map[String, Long]]()
  def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}

object HeavyHitters {
  /** Column aggregate: Misra–Gries candidate keys (≤ m) for a string key
    * column. Every key with true count > N/(m+1) is guaranteed present.
    */
  def mgCandidates(key: Column, m: Int): Column =
    udaf(new MisraGries(m)).apply(key)
}
