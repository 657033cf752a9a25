package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines,
  * composed entirely from codegen'd Catalyst builtins (split, higher-order
  * array functions, regexp, md5) — no UDFs, so whole-stage codegen covers
  * every path and the expressions stay pushdown/pruning-friendly.
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
    * higher, char-floods → 0). Entirely in-row built-in higher-order
    * functions (`log2 n − Σ f·log2 f ⁄ n` with a nested filter() count):
    * the plan stays scan → project — no shuffle, no UDF, no explode.
    * Plan note: Spark's HOF expressions carry no doGenCode, so the
    * projection evaluates OUTSIDE WholeStageCodegen — still pure-JVM
    * expression eval with zero (de)serialization, just not fused; the
    * scale properties (single scan, nothing moves) are unaffected.
    * Per-row cost O(len·distinct_chars), bounded by the charset.
    */
  def charEntropy(cs: Column): Column = {
    // single fold over the SORTED array with (prev, runLen, acc) struct
    // state: equal chars are adjacent after the sort, so Σ f·log2 f
    // accumulates run-by-run in one O(n log n + n) pass — the naive
    // per-distinct-char filter() recount is O(n·distinct) with one array
    // allocation per distinct char and benched ~6× slower on the driver
    // corpus. The empty-string init sentinel cannot collide with a real
    // element ([[chars]] filters empties). log2(1) = 0, so the `run = 0`
    // init contributes nothing through the first close.
    val sorted = array_sort(cs)
    val folded = aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0.0).as("run"), lit(0.0).as("acc")),
      (s, c) => {
        val same = s.getField("prev") === c
        val closedAcc = s.getField("acc") +
          s.getField("run") * log2(greatest(s.getField("run"), lit(1.0)))
        struct(
          c.as("prev"),
          when(same, s.getField("run") + 1.0).otherwise(1.0).as("run"),
          when(same, s.getField("acc")).otherwise(closedAcc).as("acc"))
      },
      s => s.getField("acc") +
        s.getField("run") * log2(greatest(s.getField("run"), lit(1.0))))
    log2(size(cs)) - folded / size(cs)
  }
}
