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
