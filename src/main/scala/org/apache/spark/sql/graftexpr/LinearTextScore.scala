package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: linear text-quality score `w·φ(text)` over
  * hashed bag-of-token features, evaluated IN-ROW at the scan — the
  * fastText/CCNet-style learned quality filter (Joulin et al. 2016,
  * "Bag of Tricks for Efficient Text Classification"; the public
  * Dolma/CCNet pipelines run exactly this shape as their learned-filter
  * leg next to rule-based scoring).
  *
  * φ(text): tokens are maximal ASCII-letter runs (`[A-Za-z]+`),
  * lowercased; each token hashes to a bucket by the rolling polynomial
  * `h = (h·31 + byte) mod 2²⁰`, then `mod |weights|`. The score is the
  * MEAN of the bucket weights (0.0 for a token-free text — a fixed
  * sentinel, never NaN: Spark orders NaN above every double, so a NaN
  * degrade would silently pass a `>= threshold` keep-filter).
  *
  * Codegen: one pass over the UTF8String's BYTES — tokenize, hash, and
  * accumulate in a single loop inside the whole-stage-generated method,
  * no regex, no token array, no boxing; the weight vector is a plan
  * literal (broadcast for free). The byte-level scan equals the
  * codepoint-level `[A-Za-z]+` tokenization on arbitrary UTF-8: ASCII
  * letters are single bytes, and every byte of a multi-byte codepoint
  * has the high bit set, so non-ASCII text separates tokens identically.
  *
  * The arithmetic is oracle-replayable by construction: integer hash
  * folds, and (for the intended dyadic-rational weights, e.g. k/1024)
  * EXACT double sums — order-independent, so the DuckDB replay of the
  * same features hash-matches bit for bit.
  *
  * Null semantics match the builtins: null if text or weights is null.
  * Elements of `weights` are assumed non-null; an EMPTY weights array is
  * a degenerate model and scores 0.0 (the same no-information sentinel
  * as token-free text — never a divide-by-zero out of the registered
  * SQL function).
  */
case class LinearTextScore(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_text_score"

  /** Hash modulus: 2²⁰ keeps the fold in small longs (h·31 + 127 < 2²⁵)
    * on both engines while leaving headroom over any realistic bucket
    * count.
    */
  private val HashMod = 1048576L

  override protected def nullSafeEval(t: Any, w: Any): Any = {
    val s = t.asInstanceOf[UTF8String]
    val weights = w.asInstanceOf[ArrayData]
    val b = weights.numElements()
    // empty weight vector = degenerate model: score 0.0 (the same
    // no-information sentinel as token-free text), never a divide-by-
    // zero crash out of the registered SQL function
    if (b == 0) return 0.0
    val nb = s.numBytes()
    var h = 0L
    var in = false
    var tok = 0
    var sum = 0.0
    var i = 0
    while (i < nb) {
      val c = s.getByte(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) {
        h = (h * 31L + (c | 0x20).toLong) % HashMod
        in = true
      } else if (in) {
        sum += weights.getDouble((h % b).toInt); tok += 1
        h = 0L; in = false
      }
      i += 1
    }
    if (in) { sum += weights.getDouble((h % b).toInt); tok += 1 }
    if (tok == 0) 0.0 else sum / tok
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w) => {
      val nb = ctx.freshName("nb")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val in = ctx.freshName("in")
      val tok = ctx.freshName("tok")
      val sum = ctx.freshName("sum")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $nb = $t.numBytes();
         |int $b = $w.numElements();
         |long $h = 0L; boolean $in = false; int $tok = 0; double $sum = 0.0;
         |if ($b > 0) {
         |  for (int $i = 0; $i < $nb; $i++) {
         |    byte $c = $t.getByte($i);
         |    if (($c >= 'A' && $c <= 'Z') || ($c >= 'a' && $c <= 'z')) {
         |      $h = ($h * 31L + (long) ($c | 0x20)) % ${HashMod}L;
         |      $in = true;
         |    } else if ($in) {
         |      $sum += $w.getDouble((int) ($h % $b)); $tok++;
         |      $h = 0L; $in = false;
         |    }
         |  }
         |  if ($in) { $sum += $w.getDouble((int) ($h % $b)); $tok++; }
         |}
         |${ev.value} = ($tok == 0) ? 0.0 : $sum / $tok;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LinearTextScore =
    copy(left = newLeft, right = newRight)
}

/** Count of [[LinearTextScore]]'s feature tokens (`[A-Za-z]+` runs) —
  * the same byte-level scan with the hash/weight work stripped, so a
  * query that emits both the score and its token count (t29) pays two
  * cheap byte passes instead of a Java-regex pass plus a token-array
  * allocation (`size(regexp_extract_all(...))`, the spelling this
  * replaced). Null in → null out; empty text → 0.
  */
case class AsciiTokenCount(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_token_count"

  override protected def nullSafeEval(t: Any): Any = {
    val s = t.asInstanceOf[UTF8String]
    val nb = s.numBytes()
    var in = false
    var tok = 0L
    var i = 0
    while (i < nb) {
      val c = s.getByte(i)
      val letter = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
      if (letter && !in) tok += 1L
      in = letter
      i += 1
    }
    tok
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val nb = ctx.freshName("nb")
      val in = ctx.freshName("in")
      val tok = ctx.freshName("tok")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val letter = ctx.freshName("letter")
      s"""
         |int $nb = $t.numBytes();
         |boolean $in = false; long $tok = 0L;
         |for (int $i = 0; $i < $nb; $i++) {
         |  byte $c = $t.getByte($i);
         |  boolean $letter =
         |    ($c >= 'A' && $c <= 'Z') || ($c >= 'a' && $c <= 'z');
         |  if ($letter && !$in) $tok++;
         |  $in = $letter;
         |}
         |${ev.value} = $tok;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): AsciiTokenCount = copy(child = newChild)
}
