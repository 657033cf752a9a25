package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines,
  * composed from codegen'd Catalyst builtins (split, higher-order array
  * functions, regexp, md5) so whole-stage codegen covers the paths and
  * the expressions stay pushdown/pruning-friendly — except the one
  * loop-heavy kernel ([[charEntropy]]), which is compiled per the repo's
  * HOF-vs-kernel rule.
  *
  * These are the building blocks behind the `t*_…` entries in
  * [[graft.queries.Text]]: token counting, type-token ratio, quality
  * scoring, stopword-profile language ID, and content fingerprinting.
  */
object TextFunctions {

  /** Whitespace tokenization. The driver corpus is single-space separated;
    * for arbitrary text use [[regexTokens]].
    */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish lexical split: word pieces OR single non-space punctuation —
    * the standard pre-tokenizer shape (`\w+` runs and isolated symbols).
    */
  def regexTokens(text: Column): Column =
    // regexp_extract_all is the codegen'd builtin; pattern groups word runs
    // and single punctuation marks like a byte-pair pre-tokenizer would.
    regexp_extract_all(text, lit("""(\w+|[^\w\s])"""), lit(1))

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Type-token ratio — the classic lexical-diversity / quality signal. */
  def typeTokenRatio(text: Column): Column =
    distinctTokenCount(text).cast("double") / tokenCount(text).cast("double")

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t)).cast("double") /
      tokenCount(text).cast("double")

  /** Fraction of tokens that appear in `words` (e.g. a stopword list). */
  def wordListRatio(text: Column, words: Seq[String]): Column =
    wordListHits(text, words).cast("double") / tokenCount(text).cast("double")

  /** Count of tokens that appear in `words`. */
  def wordListHits(text: Column, words: Seq[String]): Column = {
    val list = array(words.map(lit): _*)
    size(filter(tokens(text), t => array_contains(list, t)))
  }

  /** English-ish stopwords present in common corpora; used for the quality
    * score's stopword-ratio component.
    */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Composite quality score in [0,1]: rewards stopword presence (natural
    * prose), mid-range document length, and lexical diversity — the
    * length/punct/stopword-ratio family of heuristic filters used by
    * large-scale corpus cleaning pipelines.
    */
  def qualityScore(text: Column): Column = {
    val stop = least(wordListRatio(text, EnglishStopwords) * 10.0, lit(1.0))
    val len = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val diversity = typeTokenRatio(text)
    (stop + len + diversity) / 3.0
  }

  /** Per-language stopword profiles for [[langId]]. Ordered — the CASE
    * tie-break prefers earlier entries (must match the oracle SQL exactly).
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "de", "et", "un"),
    "de" -> Seq("der", "die", "das", "und", "ein"))

  /** Stopword-profile language ID: score = count of tokens in each
    * language's profile; predicted = first language (profile order) with
    * the maximal score, or 'und' when every score is zero. Deterministic
    * n-gram-free heuristic — SQL-expressible, so the DuckDB oracle can
    * replay it bit-for-bit.
    */
  def langId(text: Column): Column = {
    val scores = LangProfiles.map { case (l, ws) => l -> wordListHits(text, ws) }
    val maxScore = greatest(scores.map(_._2): _*)
    val cases = scores.foldLeft(when(maxScore === 0, lit("und"))) {
      case (acc, (l, s)) => acc.when(s === maxScore, lit(l))
    }
    cases
  }

  /** Content fingerprint: md5 over the sorted distinct token set — an
    * order-insensitive document signature (bag-of-words dedup key). Two
    * docs with the same vocabulary collide regardless of word order.
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Character array of a text column. The empty-string filter makes the
    * element count engine-portable: Java's regex split can emit boundary
    * empties that DuckDB's `string_split('')` never produces.
    */
  def chars(text: Column): Column =
    filter(split(text, ""), c => c =!= lit(""))

  /** Character-level Shannon entropy in bits/char over a [[chars]] array
    * — the gibberish/binary-spill quality signal (prose ≈4-4.5, base64
    * higher, char-floods → 0). `log2 n − Σ f·log2 f ⁄ n` as a COMPILED
    * per-row kernel (one HashMap count pass + one fold over ≤|charset|
    * entries): this is exactly the loop-heavy case the repo's design
    * rules route to a compiled function — the same formula as a built-in
    * HOF fold is interpreted expression-tree eval per element (the
    * [[graft.functions.Sketches]] kernels replaced their HOF spellings
    * for the same reason; the sorted-fold HOF spelling benched 3× slower
    * here — 1.44 s vs 0.48 s min-of-3 at sf0.1 — and the per-distinct
    * filter() recount ~6× the fold again). The plan is still
    * scan → project — no shuffle, no explode — and the UDF's single
    * array argument is the only (de)serialization. Per-term arithmetic
    * is the identical IEEE `f·log2 f`; only the summation order is
    * implementation-specific, the same t21-documented tolerance every
    * engine pair already rides.
    */
  def charEntropy(cs: Column): Column =
    log2(size(cs)) - entropyUdf(cs) / size(cs)

  private val log2e = 1.0 / math.log(2.0)

  private val entropyUdf =
    udf((cs: Seq[String]) => {
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      cs.foreach(c => m.updateWith(c) {
        case Some(n) => Some(n + 1L)
        case None => Some(1L)
      })
      var acc = 0.0
      m.valuesIterator.foreach { f =>
        acc += f.toDouble * (math.log(f.toDouble) * log2e)
      }
      acc
    })

  /** Linear classifier score over hashed bag-of-token features — native
    * codegen Expression ([[org.apache.spark.sql.graftexpr.LinearTextScore]]):
    * tokenize + hash + accumulate in ONE byte-level loop inside the
    * whole-stage-generated method. The composed-builtin spelling
    * (regexp_extract_all → transform → aggregate) allocates a token
    * array and two HOF closures per row and breaks the codegen stage.
    */
  def linearTextScore(text: Column, weights: Column): Column = {
    import org.apache.spark.sql.graftexpr.{GraftExprBridge => B, LinearTextScore}
    B.column(LinearTextScore(B.expression(text), B.expression(weights)))
  }

  /** [[linearTextScore]]'s feature-token count — the same byte-level
    * scan without the hash/weight work (vs `size(regexp_extract_all)`:
    * no regex engine, no token-array allocation, stays in codegen).
    */
  def asciiTokenCount(text: Column): Column = {
    import org.apache.spark.sql.graftexpr.{AsciiTokenCount, GraftExprBridge => B}
    B.column(AsciiTokenCount(B.expression(text)))
  }
}
