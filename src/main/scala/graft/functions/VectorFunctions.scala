package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType` embedding columns, composed from
  * higher-order functions (`zip_with` + `aggregate`) — codegen'd, no UDFs,
  * no MLlib dependency. Inputs are cast to double element-wise so the
  * arithmetic is exact-order IEEE double (reproducible against an oracle
  * computing the same sequential fold).
  */
object VectorFunctions {

  private def d(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity: dot / (||a|| * ||b||). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Random-hyperplane LSH signature (`nBits` sign bits) for cosine
    * similarity. Hyperplane p's component in dimension i is ±1 derived from
    * `xxhash64(p, i)` — deterministic, seedless, identical on every
    * executor, so no hyperplane matrix needs broadcasting. Signature bit p
    * = sign of <v, h_p>, packed into a long.
    *
    * P[bit match] = 1 - angle/π, so bucket-equal vectors are
    * angularly close — the standard SRP-LSH ANN construction.
    */
  def srpSignature(v: Column, nBits: Int = 16): Column = {
    val dv = d(v)
    aggregate(
      sequence(lit(0), lit(nBits - 1)),
      lit(0L),
      (acc, p) => {
        val proj = aggregate(
          zip_with(dv, sequence(lit(0), size(dv) - 1),
            (x, i) => when((shiftright(xxhash64(p, i), 1).bitwiseAND(1L)) === 1L, x)
              .otherwise(-x)),
          lit(0.0), (a2, x) => a2 + x)
        acc.bitwiseOR(when(proj >= 0, call_function("shiftleft", lit(1L), p))
          .otherwise(0L))
      })
  }
}
