package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis queries over the `documents` table — the corpus-cleaning
  * operator family a 100 TB training-data pipeline runs before anything
  * else: token statistics, heuristic quality filtering, language ID,
  * content fingerprinting, and vocabulary aggregation.
  *
  * Everything is a narrow projection + hash aggregate over a single scan —
  * embarrassingly parallel, no shuffle except the final aggregates; the
  * expressions are all codegen'd builtins (see
  * [[graft.functions.TextFunctions]]), so per-row cost is a few dozen ns
  * and the plan scales linearly with partitions.
  */
object Text {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-document token statistics (token counting + lexical diversity).
    "t1_text_stats" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      d.select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        distinctTokenCount(col("text")).as("n_distinct"),
        typeTokenRatio(col("text")).as("ttr"),
        avgTokenLen(col("text")).as("avg_token_len"))
    }),

    // Heuristic quality filter: keep docs above a score threshold —
    // the shape of a C4/Gopher-style cleaning rule.
    "t2_quality_filter" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          qualityScore(col("text")).as("quality"),
          wordListRatio(col("text"), EnglishStopwords).as("stopword_ratio"))
        .filter(col("quality") >= 0.5)
    }),

    // Stopword-profile language ID vs the labeled lang column.
    "t3_langid" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          langId(col("text")).as("pred_lang"))
    }),

    // Content fingerprint (md5 of sorted distinct tokens) + collision
    // groups: docs sharing a bag-of-words signature — order-insensitive
    // exact dedup candidates.
    "t4_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy(fingerprint(col("text")).as("fp"))
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
        .filter(col("n_docs") >= 2)
    }),

    // Vocabulary aggregation: explode tokens → global top-20 by frequency
    // (partial+final hash agg, then TakeOrderedAndProject — no global sort).
    "t5_vocab_topk" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(20)
    }),

    // BPE-ish regex tokenization: lexical piece count per doc (word runs +
    // isolated punctuation), vs whitespace count — the pre-tokenizer shape.
    "t6_regex_tokens" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(regexTokens(col("text"))).as("n_pieces"),
          tokenCount(col("text")).as("n_ws_tokens"))
        .filter(col("doc_id") < 200)
    }),

    // Deterministic hash split: reproducible train/validation/test
    // assignment from the md5 of the stable key — the standard
    // sampling/splitting primitive for corpus pipelines (any executor, any
    // partitioning, any engine computes the same assignment; rates are hex
    // prefix thresholds: 0x1999/0xFFFF ≈ 10% test, next ≈10% validation).
    // Contrast with rand()/sample(): not reproducible across engines, and
    // re-runs reshuffle documents between splits.
    "t7_hash_split" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          substring(md5(col("doc_id").cast("string")), 1, 4).as("h"))
        .withColumn("split",
          when(col("h") < "1999", "test")
            .when(col("h") < "3333", "validation")
            .otherwise("train"))
    }),

    // Bigram corpus statistics (the n-gram LM / BPE-merge counting shape):
    // adjacent-token pairs per doc via zip_with of two slices (no UDF;
    // empty for 1-token docs by construction), exploded and counted
    // globally — partial+final hash agg then TakeOrderedAndProject.
    "t9_bigram_stats" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(tokens(col("text")).as("toks"))
        .select(explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("bigram"))
        .limit(25)
    }),

    // Redaction transform: regexp_replace token scrubbing + a count of
    // redactions — the shape of a PII-scrub pass (emails, phone numbers,
    // ids). The synthetic corpus carries no digits or emails, so the
    // pattern redacts a stopword set instead — the plan (codegen'd
    // regexp_replace + regexp_extract_all in one scan, no UDF) is
    // identical for any pattern list.
    "t8_scrub" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          regexp_replace(col("text"), ScrubPattern, "<STOP>").as("text_clean"),
          size(regexp_extract_all(col("text"), lit(ScrubPattern), lit(1)))
            .as("n_redactions"))
        .filter(col("doc_id") < 150)
    })
  )

  /** Stand-in scrub pattern (see t8): \b-anchored alternation, identical
    * semantics in Java regex and DuckDB's RE2.
    */
  private val ScrubPattern = "\\b(the|a|of|and|in|to|is)\\b"

  private val langCase: String = {
    val scores = LangProfiles.map { case (l, ws) =>
      l -> s"len(list_filter(string_split(text,' '), t -> list_contains(${ws.mkString("['", "','", "']")}, t)))"
    }
    val maxExpr = s"greatest(${scores.map(_._2).mkString(", ")})"
    val whens = scores.map { case (l, e) => s"WHEN $e = $maxExpr THEN '$l'" }
    s"CASE WHEN $maxExpr = 0 THEN 'und' ${whens.mkString(" ")} END"
  }

  private val stopList = EnglishStopwords.mkString("['", "','", "']")

  val oracleSql: Map[String, String] = Map(
    "t1_text_stats" ->
      """SELECT doc_id,
        |  len(string_split(text,' ')) AS n_tokens,
        |  len(list_distinct(string_split(text,' '))) AS n_distinct,
        |  len(list_distinct(string_split(text,' ')))::DOUBLE
        |    / len(string_split(text,' ')) AS ttr,
        |  list_sum(list_transform(string_split(text,' '), t -> length(t)))::DOUBLE
        |    / len(string_split(text,' ')) AS avg_token_len
        |FROM documents""".stripMargin,

    "t2_quality_filter" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    len(list_filter(string_split(text,' '),
         |        t -> list_contains($stopList, t)))::DOUBLE
         |      / len(string_split(text,' ')) AS stopword_ratio,
         |    len(string_split(text,' ')) AS n_tokens,
         |    len(list_distinct(string_split(text,' ')))::DOUBLE
         |      / len(string_split(text,' ')) AS ttr
         |  FROM documents)
         |SELECT doc_id,
         |  (least(stopword_ratio * 10.0, 1.0) + least(n_tokens / 100.0, 1.0) + ttr) / 3.0 AS quality,
         |  stopword_ratio
         |FROM q
         |WHERE (least(stopword_ratio * 10.0, 1.0) + least(n_tokens / 100.0, 1.0) + ttr) / 3.0 >= 0.5""".stripMargin,

    "t3_langid" ->
      s"SELECT doc_id, lang, $langCase AS pred_lang FROM documents",

    "t4_fingerprint" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text,' '))), ' ')) AS fp,
        |  count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM documents
        |GROUP BY 1
        |HAVING count(*) >= 2""".stripMargin,

    "t5_vocab_topk" ->
      """SELECT token, count(*) AS freq
        |FROM (SELECT unnest(string_split(text,' ')) AS token FROM documents)
        |GROUP BY token
        |ORDER BY freq DESC, token
        |LIMIT 20""".stripMargin,

    "t6_regex_tokens" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '(\w+|[^\w\s])', 1)) AS n_pieces,
        |  len(string_split(text,' ')) AS n_ws_tokens
        |FROM documents
        |WHERE doc_id < 200""".stripMargin,

    "t7_hash_split" ->
      """SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999' THEN 'test'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '3333' THEN 'validation'
        |       ELSE 'train' END AS split
        |FROM documents""".stripMargin,

    "t9_bigram_stats" ->
      """SELECT bigram, count(*) AS freq
        |FROM (SELECT unnest([toks[i] || ' ' || toks[i+1]
        |                     for i in range(1, len(toks))]) AS bigram
        |      FROM (SELECT string_split(text, ' ') AS toks FROM documents))
        |GROUP BY bigram
        |ORDER BY freq DESC, bigram
        |LIMIT 25""".stripMargin,

    "t8_scrub" ->
      """SELECT doc_id,
        |  regexp_replace(text, '\b(the|a|of|and|in|to|is)\b', '<STOP>', 'g') AS text_clean,
        |  len(regexp_extract_all(text, '\b(the|a|of|and|in|to|is)\b', 1)) AS n_redactions
        |FROM documents
        |WHERE doc_id < 150""".stripMargin
  )
}
