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

  /** Sequential-fold dot product — native codegen Expression
    * ([[graft.functions.expressions.DotProduct]]): primitive ArrayData
    * loop inside whole-stage codegen. (The HOF `aggregate(zip_with(…))`
    * formulation is interpreted per element; a Scala UDF boxes both arrays
    * per call. Measured: Expression < UDF << HOF on pair joins.)
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftexpr.{DotProduct, GraftExprBridge => B}
    // no cast wrapper: DotProduct reads float/double arrays natively (a
    // transform-based cast would break the codegen stage)
    B.column(DotProduct(B.expression(a), B.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — fused one-pass codegen Expression (dot and both
    * norms accumulate in a single loop; the composed `dot/(norm·norm)`
    * would scan each array three times). Bit-identical to the composed
    * form (each accumulator folds in the same order).
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftexpr.{CosineSim, GraftExprBridge => B}
    B.column(CosineSim(B.expression(a), B.expression(b)))
  }

  /** L2-normalize to a unit vector: pre-computing this once per row turns
    * every downstream cosine into a plain dot product (the norm is not
    * recomputed per compared pair). Compiled kernel.
    */
  def normalized(a: Column): Column = Sketches.normalizeUdf(a)

  /** Euclidean (L2) distance (compiled kernel — the HOF formulation is
    * interpreted per element like the other replaced kernels).
    */
  def l2(a: Column, b: Column): Column = Sketches.l2Udf(d(a), d(b))

  /** int8 scalar-quantized codes of a unit vector (fixed scale 127 —
    * see [[Sketches.quantizeUnitUdf]]): the 8×-smaller representation an
    * ANN first pass scans instead of the float corpus.
    */
  def quantize8(unit: Column): Column = Sketches.quantizeUnitUdf(unit)

  /** Sign-bit 64-bit binarization of a float vector (the 1-bit/dim tier
    * under int8 — see [[Sketches.binarize64Udf]]).
    */
  def binarize64(v: Column): Column = Sketches.binarize64Udf(v)

  /** Exact integer dot product of two int8 code arrays. */
  def intDot(a: Column, b: Column): Column = Sketches.intDotUdf(a, b)

  /** Random-hyperplane LSH signature (`nBits` sign bits) for cosine
    * similarity. Hyperplane p's component in dimension i is ±1 derived from
    * `xxhash64(p, i)` — deterministic, seedless, identical on every
    * executor, so no hyperplane matrix needs broadcasting. Signature bit p
    * = sign of <v, h_p>, packed into a long.
    *
    * P[bit match] = 1 - angle/π, so bucket-equal vectors are
    * angularly close — the standard SRP-LSH ANN construction.
    */
  def srpSignature(v: Column, nBits: Int = 16): Column =
    Sketches.srpUdf(nBits)(v)
}
