package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalDedup

/** [[graft.operators.IncrementalDedup]]: the ingest-time screen must be
  * EXACT regardless of the Bloom pre-filter — the filter only moves rows
  * between the bypass path and the anti-join path.
  */
class IncrementalDedupSpec extends SparkSuite {
  import spark.implicits._

  private def fixture = {
    // batch: k1 twice (in-batch dup), k2 (corpus dup), k3 novel
    val batch = Seq((10L, "k1"), (11L, "k1"), (12L, "k2"), (13L, "k3"))
      .toDF("doc_id", "h")
    val corpus = Seq("k2", "k5", "k5").toDF("h") // non-distinct on purpose
    (batch, corpus)
  }

  test("winner cut + corpus screen: exact kept set") {
    val (batch, corpus) = fixture
    val kept = IncrementalDedup(batch, corpus, "h", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    // k1 → min winner 10; k2 dropped (corpus); k3 kept
    assert(kept.toSeq == Seq(10L, 13L))
  }

  test("bloom pre-filter is result-invariant, even at adversarial fpp") {
    val (batch, corpus) = fixture
    val exact = IncrementalDedup(batch, corpus, "h", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // fpp 0.5 forces false positives through the anti-join confirm path;
    // tiny sizing stresses saturation — the result must not move
    for (fpp <- Seq(0.01, 0.5)) {
      val bloomed = IncrementalDedup(batch, corpus, "h", "doc_id",
        bloomItems = 2L, fpp = fpp)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(bloomed == exact, s"fpp=$fpp diverged")
    }
  }

  test("ingest stream == batch: per-micro-batch screen with key feedback") {
    // the production deployment: each micro-batch of "today's crawl" is
    // screened via foreachBatch against the corpus key table, and the
    // admitted keys are APPENDED to that table before the next batch (in
    // production a Delta/parquet append; here a growing union). With
    // id-ordered delivery the first-seen winner equals the batch form's
    // global min-winner, so the admitted set must match p9's kept set
    // exactly.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val batch = docs.filter(col("doc_id") % 10 === 7)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7).select("h")
    val expected = IncrementalDedup(batch, corpus, "h", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq

    val mem = MemoryStream[(Long, String)]
    var corpusKeys = corpus
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = mem.toDS().toDF("doc_id", "h").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val kept = IncrementalDedup(b, corpusKeys, "h", "doc_id")
          .select("doc_id", "h").persist()
        admitted ++= kept.select("doc_id").as[Long](
          org.apache.spark.sql.Encoders.scalaLong).collect()
        corpusKeys = corpusKeys.unionByName(kept.select("h"))
        ()
      }
      .start()
    val rows = batch.select("doc_id", "h").as[(Long, String)]
      .collect().sortBy(_._1)
    rows.grouped(rows.length / 3 + 1).foreach { chunk =>
      mem.addData(chunk.toSeq); q.processAllAvailable()
    }
    q.stop()
    assert(admitted.sorted.toSeq == expected)
  }

  test("property: kept set == plain-Scala reference over random batches") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // small key alphabet forces heavy in-batch and cross-set collisions
    val keyGen = Gen.oneOf((1 to 12).map(i => s"k$i"))
    val caseGen = for {
      n <- Gen.choose(0, 30)
      keys <- Gen.listOfN(n, keyGen)
      m <- Gen.choose(0, 12)
      corpus <- Gen.listOfN(m, keyGen)
      bloom <- Gen.oneOf(0L, 8L)
    } yield (keys.zipWithIndex.map { case (k, i) => (i.toLong, k) },
      corpus, bloom)
    val prop = Prop.forAll(caseGen) { case (batchRows, corpus, bloom) =>
      val batch = batchRows.toDF("doc_id", "h")
      val corpusDf = corpus.toDF("h")
      val got = IncrementalDedup(batch, corpusDf, "h", "doc_id",
        bloomItems = bloom)
        .select("doc_id").as[Long].collect().sorted.toSeq
      // reference: first (min-id) occurrence per key, minus corpus keys
      val want = batchRows.groupBy(_._2).view
        .mapValues(_.map(_._1).min).toSeq
        .collect { case (k, id) if !corpus.contains(k) => id }
        .sorted
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("bloom on the real corpus shape: p9's query is filter-invariant") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val batch = docs.filter(col("doc_id") % 10 === 7)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7).select("h")
    def keptIds(items: Long) =
      IncrementalDedup(batch, corpus, "h", "doc_id", bloomItems = items)
        .select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptIds(0L) == keptIds(corpus.count()))
  }
}
