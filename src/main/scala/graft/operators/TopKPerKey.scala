package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped top-k — "for every key, the k best rows" (batch kNN
  * serving, per-user recommendations, per-query candidate cuts).
  *
  * The window formulation (`row_number over (partition by key order by
  * score)` then `rn <= k`) shuffles the ENTIRE scored frame on the key —
  * for batch kNN that is corpus × queries rows concentrated onto
  * |keys| partitions: a skew disaster at scale. This operator does what
  * TakeOrderedAndProject does for the single-group case, generalized per
  * key: a bounded heap per (partition, key) prunes locally inside
  * `mapPartitions` (the documented last-resort tier — justified here
  * because Spark has no grouped-top-k aggregate, and the alternative
  * moves the whole frame), so only ≤ partitions × keys × k survivors
  * reach the exact global window, whose shuffle is then negligible.
  *
  * Result is exact, not approximate: every global top-k row is a local
  * top-k row of its partition (ordering is total via the tie column), so
  * local pruning never discards a global winner.
  */
object TopKPerKey {

  /** Top `k` rows per distinct `keyCol`, "best" = highest `scoreCol`
    * (double), ties broken by ascending `tieCol` (long, unique per row —
    * makes the ordering total and the result deterministic).
    */
  def topK(df: DataFrame, keyCol: String, scoreCol: String, tieCol: String,
      k: Int): DataFrame = {
    require(k > 0)
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val scoreIdx = schema.fieldIndex(scoreCol)
    val tieIdx = schema.fieldIndex(tieCol)
    // min-heap ordering on (score asc, tie desc): the heap head is the
    // WORST kept row, evicted when a better one arrives
    val heapOrd: Ordering[Row] = Ordering.by { r: Row =>
      (-r.getDouble(scoreIdx), r.getLong(tieIdx))
    }
    val pruned = df.mapPartitions { it =>
      val heaps = mutable.HashMap.empty[Any, mutable.PriorityQueue[Row]]
      it.foreach { r =>
        val h = heaps.getOrElseUpdate(r.get(keyIdx),
          mutable.PriorityQueue.empty[Row](heapOrd))
        if (h.size < k) h.enqueue(r)
        else if (heapOrd.lt(r, h.head)) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(schema))
    // exact finalize over ≤ partitions × keys × k survivors
    val w = Window.partitionBy(keyCol)
      .orderBy(col(scoreCol).desc, col(tieCol))
    pruned.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }
}
