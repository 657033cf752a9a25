package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{charEntropy, chars}

/** Semantics of the character-entropy quality signal (t21): exact values
  * on closed-form strings, plus corpus-level envelope checks.
  */
class TextQualitySpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("charEntropy matches closed-form values") {
    import spark.implicits._
    val got = Seq(
      (1L, "aaaa"),        // one symbol → 0 bits
      (2L, "abab"),        // two equiprobable → 1 bit
      (3L, "abcd"),        // four equiprobable → 2 bits
      (4L, "hello world")) // hand-computed reference
      .toDF("id", "s")
      .select(col("id"), charEntropy(chars(col("s"))).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1) == 0.0)
    assert(math.abs(got(2) - 1.0) < 1e-12)
    assert(math.abs(got(3) - 2.0) < 1e-12)
    assert(math.abs(got(4) - 2.8453509366224363) < 1e-12)
  }

  test("t21 entropies sit in the Shannon envelope and n matches length") {
    val r = SparkEntry.queries("t21_char_entropy")(spark, sf)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
    val j = r.join(docs, "doc_id")
    // the split-based count must agree with plain length (ASCII corpus) —
    // a Spark/DuckDB split-boundary divergence would show up here first
    assert(j.filter(col("n_ch") =!= col("len")).isEmpty)
    // 0 ≤ H ≤ log2(n_ch) always; prose should be solidly interior
    assert(j.filter(col("entropy") < 0 ||
      col("entropy") > log2(col("n_ch"))).isEmpty)
    val avg0 = r.agg(avg("entropy")).first().getDouble(0)
    assert(avg0 > 3.0 && avg0 < 5.5,
      s"corpus mean entropy $avg0 outside the natural-text band")
  }

  test("t22 rewrite: untouched docs reassemble byte-identically, edits are real") {
    val rw = SparkEntry.queries("t22_segment_dedup_rewrite")(spark, sf)
      .cache()
    try {
      assert(rw.filter(col("n_kept") > col("n_segs")).isEmpty)
      // segments are consecutive token slices re-joined with the same
      // single-space separator, so a doc that loses nothing must
      // round-trip to md5(text) EXACTLY — any boundary slip (off-by-one
      // slice, separator drift) breaks this, which is the point
      val orig = Tables.documents(spark, sf)
        .select(col("doc_id"), md5(col("text")).as("orig_md5"))
      val untouchedBroken = rw.filter(col("n_kept") === col("n_segs"))
        .join(orig, "doc_id")
        .filter(col("clean_md5") =!= col("orig_md5"))
      assert(untouchedBroken.isEmpty,
        "an untouched doc failed to reassemble byte-identically")
      // and the rewrite actually edits something at sf0.001
      assert(rw.filter(col("n_kept") < col("n_segs")).count() > 0)
    } finally rw.unpersist()
  }

  test("t23 LM scores: probabilities < 1, bigram counts exact, dupes tie") {
    val r = SparkEntry.queries("t23_lm_perplexity")(spark, sf).cache()
    try {
      // Laplace-smoothed probabilities are strictly < 1 → log2 < 0
      assert(r.filter(col("avg_logp2") >= 0).isEmpty)
      // every doc with ≥2 tokens scores, with exactly n_tokens−1 bigrams
      val expected = Tables.documents(spark, sf)
        .select(col("doc_id"),
          (size(split(col("text"), " ")) - 1).cast("long").as("want"))
        .filter(col("want") >= 1)
      val j = r.join(expected, "doc_id")
      assert(j.count() == expected.count() && r.count() == expected.count())
      assert(j.filter(col("n_bigrams") =!= col("want")).isEmpty)
      // byte-identical documents must score (near-)identically — same
      // multiset of log terms, order-of-summation drift only
      val dupes = Tables.documents(spark, sf)
        .select(col("doc_id"), md5(col("text")).as("h"))
        .join(r, "doc_id")
        .groupBy("h").agg(
          countDistinct(col("n_bigrams")).as("nb"),
          (max(col("avg_logp2")) - min(col("avg_logp2"))).as("drift"),
          count(lit(1)).as("n"))
        .filter(col("n") > 1)
      // sf0.001 may carry no exact dupes — the tie property is vacuous then
      assert(dupes.filter(col("nb") =!= 1 || col("drift") > 1e-12).isEmpty)
    } finally r.unpersist()
  }
  test("t28 BPE: greedy non-overlap, argmax ties, dry stop — hand-computed") {
    // fixture: words aaa×3, ab×1, b×3. Exercises the three hazards a
    // naive merge loop gets wrong:
    //  - greedy left-to-right on a run: "aaa" under (a,a) → [aa, a],
    //    never [aa, aa];
    //  - argmax ties break (left, right) ascending on BINARY order:
    //    round 3 has (a,</w>)=3 vs (aa,a)=3 → "a" < "aa" wins;
    //  - the loop stops when no pair remains (5 merges, not k=12).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe-docs").toString
    Seq((0L, "aaa aaa ab b b"), (1L, "aaa b"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val got = SparkEntry.queries("t28_bpe_train")(spark, dir)
        .orderBy("step")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      val want = Seq(
        (1L, "a", "a", 6L),
        (2L, "b", "</w>", 4L),
        (3L, "a", "</w>", 3L),
        (4L, "aa", "a</w>", 3L),
        (5L, "a", "b</w>", 1L))
      assert(got == want, s"merge table mismatch:\n got $got\nwant $want")
    } finally graft.util.Fs.rmTree(new java.io.File(dir))
  }

  test("t28 BPE: driver-tier and distributed merge loops agree exactly") {
    // the tiered rewrite (r12 verdict ask #1) must be a pure execution
    // move: identical merge table — same argmax, same counts, same
    // (cnt desc, l, r) tie-breaks — from the in-memory incremental loop
    // and the per-round distributed loop. The fixture mixes 1-, 2- and
    // 3-byte UTF-8 symbols so the driver comparator's UTF-8-binary
    // order (Spark's string order, NOT String.compareTo) is exercised,
    // and the random word soup makes count ties common.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe-tier").toString
    val rnd = new scala.util.Random(43)
    val alpha = Seq("a", "b", "c", "é", "ø", "中", "z")
    def word(): String =
      (0 to rnd.nextInt(4)).map(_ => alpha(rnd.nextInt(alpha.size))).mkString
    val docs = (0L until 60L).map(i =>
      (i, (0 until 12).map(_ => word()).mkString(" ")))
    docs.toDF("doc_id", "text").coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val local = graft.queries.Text.bpeTrainLoop(spark, dir, 12)
      val dist =
        graft.queries.Text.bpeTrainLoop(spark, dir, 12, maxVocabRows = -1L)
      assert(local.size == 12, s"expected 12 merges, got ${local.size}")
      assert(local == dist,
        s"tier divergence:\n driver $local\n dist   $dist")
    } finally graft.util.Fs.rmTree(new java.io.File(dir))
  }

  test("t33 PII redaction: exact masking on hand strings, idempotent, " +
    "no residual matches") {
    import spark.implicits._
    import graft.queries.Text.{PiiEmailRe, PiiIpRe, PiiPhoneRe}
    val red: Column => Column = c =>
      regexp_replace(regexp_replace(regexp_replace(c,
        PiiEmailRe, "<EMAIL>"), PiiPhoneRe, "<PHONE>"), PiiIpRe, "<IP>")
    val got = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org today"),
      (2L, "call 555-123-4567 or 555-000-1111 now"),
      (3L, "server 192.168.0.1 and host 10.0.255.3"),
      (4L, "mixed a@b.co 555-111-2222 1.2.3.4"),
      (5L, "clean text with no pii at all"),
      // traps: version strings are NOT IPs (\b-bounded 4-octet only),
      // a 3-group number is NOT a phone
      (6L, "v1.2.3 build 12-345-6789x"))
      .toDF("id", "s").select(col("id"), red(col("s")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1) == "mail me at <EMAIL> today")
    assert(got(2) == "call <PHONE> or <PHONE> now")
    assert(got(3) == "server <IP> and host <IP>")
    assert(got(4) == "mixed <EMAIL> <PHONE> <IP>")
    assert(got(5) == "clean text with no pii at all")
    assert(got(6) == "v1.2.3 build 12-345-6789x")
    // idempotence: masking already-masked text changes nothing
    val twice = Seq(got(4)).toDF("s").select(red(col("s"))).first.getString(0)
    assert(twice == got(4))
  }

  test("t33 corpus law: constructed PII is fully redacted and accounted") {
    val r = SparkEntry.queries("t33_pii_redact")(spark, sf).cache()
    try {
      // every lang row accounts all docs: clean + at least one PII class
      assert(r.filter(col("n_clean") > col("n_docs")).isEmpty)
      // construction guarantees matches exist at every SF (doc_id mod
      // 3/4/5 residues all populated)
      val tot = r.agg(sum("n_email"), sum("n_phone"), sum("n_ip")).first()
      assert(tot.getLong(0) > 0 && tot.getLong(1) > 0 && tot.getLong(2) > 0)
      // redacted corpus law: re-running the matchers over the redacted
      // text finds nothing (no partial masks, no fabricated matches)
      import graft.queries.Text.{PiiEmailRe, PiiIpRe, PiiPhoneRe}
      val redacted = Tables.documents(spark, sf).select(
        regexp_replace(regexp_replace(regexp_replace(
          concat(col("text"),
            when(col("doc_id") % 3 === 0, concat(lit(" contact user"),
              col("doc_id").cast("string"), lit("@mail"),
              (col("doc_id") % 7).cast("string"), lit(".example.com")))
              .otherwise(lit("")),
            when(col("doc_id") % 4 === 1, concat(lit(" call 555-"),
              (col("doc_id") % 900 + 100).cast("string"), lit("-"),
              (col("doc_id") % 9000 + 1000).cast("string")))
              .otherwise(lit("")),
            when(col("doc_id") % 5 === 2, concat(lit(" from 10."),
              (col("doc_id") % 251).cast("string"), lit("."),
              (col("doc_id") % 200).cast("string"), lit("."),
              (col("doc_id") % 97).cast("string")))
              .otherwise(lit(""))),
          PiiEmailRe, "<EMAIL>"), PiiPhoneRe, "<PHONE>"), PiiIpRe, "<IP>")
          .as("red"))
      assert(redacted.filter(
        regexp_count(col("red"), lit(PiiEmailRe)) > 0 ||
        regexp_count(col("red"), lit(PiiPhoneRe)) > 0 ||
        regexp_count(col("red"), lit(PiiIpRe)) > 0).isEmpty)
    } finally r.unpersist()
  }

}
