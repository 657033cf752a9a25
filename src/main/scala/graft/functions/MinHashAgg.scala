package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` merging per-document MinHash signatures into one
  * group-level sketch (SURVEY §2.10's aggregation-path slot).
  *
  * MinHash signatures are mergeable: elementwise min of two signatures IS
  * the signature of the union of the underlying shingle sets — so a
  * partial+final hash aggregation over per-doc sketches yields an exact
  * corpus/group sketch with map-side combine, shuffling k longs per group
  * instead of the documents. Downstream, signature agreement between two
  * group sketches estimates the Jaccard similarity of the groups' shingle
  * unions (e.g. cross-source or cross-language corpus overlap at 100 TB
  * without ever joining documents).
  */
class MinHashMerge(k: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < k && i < sig.length) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object MinHashAgg {
  /** Column aggregate: merged MinHash sketch of a signature column. */
  def minhashMerge(sig: Column, k: Int = 32): Column =
    udaf(new MinHashMerge(k)).apply(sig)
}
