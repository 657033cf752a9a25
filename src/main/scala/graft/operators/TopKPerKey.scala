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
    * (double, non-null — null-scored rows are dropped up front, stated
    * precondition), ties broken by ascending `tieCol` (long, unique per
    * row — makes the ordering total and the result deterministic).
    * `keyCol` must be a type with value-based `equals` (the local heaps
    * group by the external key object in a HashMap): atomic types,
    * structs, strings — NOT binary, whose `Array[Byte]` uses reference
    * equality and would silently split groups. Rejected up front,
    * including binary NESTED anywhere inside a struct/array/map key
    * (Row.hashCode on a binary field is identity-based too).
    */
  private def containsBinary(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case BinaryType => true
      case s: StructType => s.fields.exists(f => containsBinary(f.dataType))
      case a: ArrayType => containsBinary(a.elementType)
      case m: MapType => containsBinary(m.keyType) || containsBinary(m.valueType)
      case _ => false
    }
  }

  def topK(df: DataFrame, keyCol: String, scoreCol: String, tieCol: String,
      k: Int): DataFrame = {
    require(k > 0)
    require(!containsBinary(df.schema(keyCol).dataType),
      s"$keyCol contains BinaryType: Array[Byte] has no value equality, " +
        "the per-partition HashMap would split its groups; key by a " +
        "hex/hash projection instead")
    val input = df.filter(col(scoreCol).isNotNull)
    val schema = input.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val scoreIdx = schema.fieldIndex(scoreCol)
    val tieIdx = schema.fieldIndex(tieCol)
    // Score comparison must match Spark SQL's DESC ordering exactly, or
    // the local prune and the global window disagree on which rows
    // survive: Spark ranks NaN greatest (first under DESC) and treats
    // -0.0 == 0.0. java.lang.Double.compare gives the NaN rule; the
    // explicit zero normalization gives the signed-zero rule.
    def score(r: Row): Double = {
      val v = r.getDouble(scoreIdx)
      if (v == 0.0) 0.0 else v
    }
    // max-heap whose head is the WORST kept row (lowest score under the
    // Spark ordering, then largest tie), evicted when a better one arrives
    val heapOrd: Ordering[Row] = new Ordering[Row] {
      def compare(x: Row, y: Row): Int = {
        val byScore = java.lang.Double.compare(score(y), score(x))
        if (byScore != 0) byScore
        else java.lang.Long.compare(x.getLong(tieIdx), y.getLong(tieIdx))
      }
    }
    val pruned = input.mapPartitions { it =>
      val heaps = mutable.HashMap.empty[Any, mutable.PriorityQueue[Row]]
      it.foreach { r =>
        val h = heaps.getOrElseUpdate(r.get(keyIdx),
          mutable.PriorityQueue.empty[Row](heapOrd))
        if (h.size < k) h.enqueue(r)
        else if (heapOrd.lt(r, h.head)) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(schema))
    // exact finalize over ≤ partitions × keys × k survivors; the rank
    // column name is collision-proofed against the input schema
    val rn = Iterator.from(0).map(i => s"_rn$i")
      .find(n => !schema.fieldNames.contains(n)).get
    val w = Window.partitionBy(keyCol)
      .orderBy(col(scoreCol).desc, col(tieCol))
    pruned.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(rn)
  }
}
