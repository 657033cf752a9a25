package graft

import org.apache.spark.sql.functions._

import graft.operators.DeterministicSample

class DeterministicSampleSpec extends SparkSuite {

  private def keys(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "stratum")
  }

  test("fraction 1.0 keeps everything exactly; 0.0 drops everything") {
    val df = keys(512)
    assert(DeterministicSample.stratified(df, col("id"), col("stratum"),
      Map("a" -> 1.0, "b" -> 1.0)).count() == 512)
    assert(DeterministicSample.stratified(df, col("id"), col("stratum"),
      Map("a" -> 0.0), default = 0.0).count() == 0)
    // out-of-range fractions clamp: negative means drop-all (an unclamped
    // negative would format as 8-char two's-complement hex and keep ALL),
    // >1 means keep-all
    assert(DeterministicSample.stratified(df, col("id"), col("stratum"),
      Map("a" -> -0.1), default = -5.0).count() == 0)
    assert(DeterministicSample.stratified(df, col("id"), col("stratum"),
      Map("a" -> 2.0, "b" -> 2.0)).count() == 512)
  }

  test("kept sets are nested: raising a fraction only adds rows") {
    val df = keys(4096)
    def kept(f: Double): Set[Long] =
      DeterministicSample.stratified(df, col("id"), col("stratum"),
        Map("a" -> f, "b" -> f))
        .select("id").collect().map(_.getLong(0)).toSet
    val k25 = kept(0.25)
    val k50 = kept(0.5)
    assert(k25.subsetOf(k50), "raising the fraction must never swap rows")
    // and the realized rates are near the requested ones (md5 uniformity)
    assert(math.abs(k25.size / 4096.0 - 0.25) < 0.05)
    assert(math.abs(k50.size / 4096.0 - 0.5) < 0.05)
  }

  test("strata sample independently at their own fractions") {
    val df = keys(4096) // 2048 per stratum
    val out = DeterministicSample.stratified(df, col("id"), col("stratum"),
        Map("a" -> 0.1, "b" -> 0.9))
      .groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("a") / 2048.0 - 0.1) < 0.05)
    assert(math.abs(out("b") / 2048.0 - 0.9) < 0.05)
  }

  test("membership is partitioning-invariant") {
    val df = keys(1024)
    def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
      DeterministicSample.stratified(d, col("id"), col("stratum"),
        Map("a" -> 0.3, "b" -> 0.7))
        .select("id").collect().map(_.getLong(0)).toSet
    assert(ids(df.repartition(1)) == ids(df.repartition(13, col("id"))))
  }

  test("p10 weighted sample: length-biased, partition-invariant, nested in N") {
    val sf = "/root/testdata/sf0.001"
    val sel = SparkEntry.queries("p10_weighted_sample")(spark, sf)
    val kept = sel.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(kept.size == 200)
    // A-ES with w = n_chars must over-represent long documents: the
    // kept-set mean length sits clearly above the corpus mean (306 at
    // sf0.001; a uniform sampler would land near it)
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg("n_chars")).first().getDouble(0)
    val keptMean = kept.values.sum.toDouble / kept.size
    assert(keptMean > corpusMean * 1.05,
      s"weighted sample mean $keptMean not above corpus mean $corpusMean")
    // engine-determinism: the kept SET survives a different shuffle
    // parallelism (the md5-derived u is a pure row function)
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      val again = SparkEntry.queries("p10_weighted_sample")(spark, sf)
        .collect().map(_.getLong(0)).toSet
      assert(again == kept.keySet)
    } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    // nestedness in N (the DeterministicSample growth property, here for
    // the sample SIZE): the top-100 by the same key order is a strict
    // prefix, so growing the budget only adds documents
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 13),
      16, 10).cast("double") / lit(4503599627370496.0)
    val top100 = Tables.documents(spark, sf)
      .select(col("doc_id"), (log(u) / col("n_chars")).as("k"))
      .orderBy(col("k").desc, col("doc_id")).limit(100)
      .collect().map(_.getLong(0)).toSet
    assert(top100.subsetOf(kept.keySet))
  }

  test("p11 token budget: fits, is tight, and is independent of the t7 split") {
    val sf = "/root/testdata/sf0.001"
    val kept = SparkEntry.queries("p11_token_budget")(spark, sf).cache()
    try {
      val budget = 10000L
      val total = kept.agg(sum("tok")).first().getLong(0)
      assert(total <= budget, s"kept $total tokens > budget $budget")
      // tight: the next (smallest excluded) bin would not have fit
      val kMax = kept.agg(max("bin")).first().getInt(0)
      val allBins = Tables.documents(spark, sf)
        .select(floor(
          conv(substring(md5(concat(lit("budget:"),
            col("doc_id").cast("string"))), 1, 13), 16, 10)
            .cast("double") / lit(4503599627370496.0) * lit(4096.0))
          .cast("int").as("bin"),
          size(split(col("text"), " ")).cast("long").as("tok"))
        .filter(col("bin") > kMax)
        .groupBy("bin").agg(sum("tok").as("bt"))
        .orderBy("bin").limit(1)
        .collect()
      assert(allBins.nonEmpty &&
        total + allBins.head.getLong(1) > budget,
        "a further bin would still have fit — the prefix was not maximal")
      // salt-independence: the slice must not drain one t7 split
      // (the UNsalted u would make kept ⊆ 'test' — the bug the salt
      // exists to prevent)
      val splits = SparkEntry.queries("t7_hash_split")(spark, sf)
        .select(col("doc_id"), col("split"))
      val nSplits = kept.join(splits, "doc_id")
        .select("split").distinct().count()
      assert(nSplits == 3, s"budget slice covers $nSplits of 3 splits")
    } finally kept.unpersist()
  }

  test("p12 DSIR: target slice scores higher and the scoring join broadcasts") {
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("p12_dsir_weights")(spark, sf)
    // the corpus never shuffles for scoring: the 256-bucket table rides a
    // broadcast join; any SortMergeJoin here means the hint was dropped
    assert(!df.queryExecution.executedPlan.toString
      .contains("SortMergeJoin"), "p12 scoring join must broadcast")
    // semantics: importance weights exist to UPWEIGHT target-like docs —
    // the English slice's mean per-token log-ratio must beat the rest
    val scored = df.join(
      Tables.documents(spark, sf).select("doc_id", "lang"), "doc_id")
      .select(col("lang") === "en", col("logw") / col("n_toks"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1)))
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val en = scored.collect { case (true, v) => v }.toSeq
    val rest = scored.collect { case (false, v) => v }.toSeq
    assert(en.nonEmpty && rest.nonEmpty)
    assert(mean(en) > mean(rest),
      s"mean per-token logw: en ${mean(en)} !> other ${mean(rest)}")
  }
}
