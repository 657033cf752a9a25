package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: sequential-fold dot product of two numeric
  * array columns (`array<double>` or `array<float>`, independently per
  * side), with whole-stage codegen (`doGenCode`).
  *
  * This is tier (b) of the extension ladder (builtin composition → custom
  * codegen Expression → UDF → mapPartitions):
  *   - the HOF formulation `aggregate(zip_with(…))` is interpreted per
  *     element AND breaks the codegen stage (higher-order functions don't
  *     codegen);
  *   - a Scala UDF converts each ArrayData into a boxed Seq per call;
  *   - this expression reads primitives straight out of ArrayData inside
  *     the generated stage — no allocation, no boxing, no stage break.
  *     Accepting `array<float>` natively matters: a cast wrapper would
  *     itself be a `transform` HOF and reintroduce the stage break.
  *
  * Null semantics match the builtins: null if either side is null;
  * elements are assumed non-null (embedding vectors); mismatched lengths
  * fold over the common prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // def, not val: TypeCollection is not Serializable and must not become a
  // field of the (task-serialized) expression tree
  override def inputTypes: Seq[AbstractDataType] = {
    val accepted = TypeCollection(ArrayType(DoubleType), ArrayType(FloatType))
    Seq(accepted, accepted)
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $getA * $getB;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Fused one-pass cosine similarity: dot, ‖a‖², ‖b‖² accumulate in a single
  * loop over the arrays (the composed `dot/(norm·norm)` form makes three
  * passes and re-reads both arrays twice). Same float/double flexibility
  * and null semantics as [[DotProduct]]; each accumulator folds
  * sequentially, so values are bit-identical to the composed form.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = {
    val accepted = TypeCollection(ArrayType(DoubleType), ArrayType(FloatType))
    Seq(accepted, accepted)
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $getA; double $yv = $getB;
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Signature agreement: fraction of equal slots of two `array<bigint>`
  * signatures — the MinHash Jaccard estimator, ranked over every surviving
  * candidate pair in dd3/dd6. The HOF formulation
  * (`size(filter(zip_with(…)))/least(size,size)`) is interpreted per slot
  * and breaks whole-stage codegen; this expression is one primitive loop
  * inside the stage. Semantics match the HOF for the dense case
  * (common-prefix fold for unequal lengths; null if either side is null;
  * a null SLOT never counts as a match — the HOF's explicit guarantee,
  * preserved here via isNullAt). Two deliberate edge divergences, both
  * toward safety for a similarity score: empty inputs yield 0.0 (the
  * ANSI-mode HOF raised DIVIDE_BY_ZERO; a NaN degrade would be worse —
  * Spark orders NaN above every double, so NaN would silently PASS any
  * `>= threshold` re-rank filter).
  */
case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_sig_agree"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    if (n == 0) return 0.0
    var m = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
        m += 1
      i += 1
    }
    m.toDouble / n.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getLong($i) == $b.getLong($i)) $m++;
         |}
         |${ev.value} = ($n == 0) ? 0.0 : (double) $m / (double) $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgree =
    copy(left = newLeft, right = newRight)
}

/** Bridge exposing the `private[sql]` Column↔Expression converters to the
  * graft packages (this file lives under org.apache.spark.sql for access —
  * the standard pattern for Spark-native extensions).
  */
object GraftExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
