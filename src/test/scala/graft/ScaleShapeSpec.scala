package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** Empirical scale-shape guard: the PLANS.md claim that the shingle
  * candidate machinery is "never corpus²" is asserted here as a measured
  * property, not just a plan-shape one — total shuffle-write RECORDS for
  * the dd2 pair pipeline must grow ~linearly when the unique-doc corpus
  * doubles (the near-dup structure, and hence the candidate-pair count,
  * is held fixed). A regression that reintroduces an uncapped
  * hot-shingle join or an all-pairs scan shows up as superlinear record
  * growth long before it shows up as wall-clock on a big corpus.
  *
  * Records, not bytes or seconds: record counts are deterministic for a
  * fixed input partitioning (bytes drift with compression codecs and
  * timings with box load). Input partitioning is pinned with a
  * repartition(4) on doc_id so map-side combine sees identical layouts
  * across sizes.
  */
class ScaleShapeSpec extends SparkSuite {

  /** Synthetic corpus: n unique word-salad docs (30 words from a 5000-word
    * vocabulary — shingles are overwhelmingly singletons) plus 4 fixed
    * near-dup pairs so the pipeline always has real candidates to rank.
    */
  private def corpus(n: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def doc(): String =
      Array.fill(30)("w" + rnd.nextInt(5000)).mkString(" ")
    val uniques = (0 until n).map(i => (i.toLong, "en", doc()))
    val dups = (0 until 4).flatMap { k =>
      val base = doc()
      Seq((100000L + 2 * k, "en", base), (100001L + 2 * k, "en", base))
    }
    (uniques ++ dups).toDF("doc_id", "lang", "text")
      .repartition(4, col("doc_id"))
  }

  /** Total shuffle-write records across all stages of `body`. Listener
    * events are asynchronous: poll until the counter is stable for a few
    * consecutive checks (records are deterministic, so "stable" means
    * "delivered", not "approximately done").
    */
  private def shuffleRecords(body: => Unit): Long = {
    val acc = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        acc.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      var last = -1L
      var stable = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val now = acc.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      acc.get()
    } finally {
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("dd2 pipeline shuffle records grow ~linearly in corpus size") {
    def run(n: Int): (Long, Long) = {
      val docs = corpus(n)
      var pairCount = 0L
      val records = shuffleRecords {
        val (pairs, _, caches) = Dedup.shingleJaccardPairsFromDocs(docs)
        pairCount = pairs.count()
        caches.foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
      }
      (records, pairCount)
    }
    val (r1, p1) = run(400)
    val (r2, p2) = run(800)
    // the candidate structure is held fixed, so the ranked output is too
    assert(p1 == 4L && p2 == 4L,
      s"expected exactly the 4 constructed dup pairs, got $p1 / $p2")
    // linear growth → ratio ≈ 2 (plus fixed per-query overhead, which
    // only pulls the ratio DOWN); an all-pairs or uncapped-hot-shingle
    // regression → ≥ 4. Gate midway at 3.
    val ratio = r2.toDouble / r1.toDouble
    assert(ratio < 3.0,
      s"superlinear shuffle growth: $r1 -> $r2 records (ratio $ratio)")
    // and the measurement itself is real: doubling the corpus must move
    // the counter (a broken listener reading 0/0 would pass the ratio)
    assert(r1 > 0 && r2 > r1,
      s"implausible shuffle measurements: $r1 -> $r2")
  }

  test("dd3 LSH pipeline shuffle records grow ~linearly in corpus size") {
    // the second dedup family gets the same empirical guard: banding
    // explodes to exactly 16 (doc, band) rows per doc, the bucket cap
    // bounds any one bucket's self-join, so total shuffle records must
    // track corpus size. An uncapped bucket flood (or banding on a
    // constant key) is quadratic and trips the ratio gate.
    import graft.functions.HashFunctions.{minhash, shingles}
    import graft.functions.TextFunctions.tokens
    def run(n: Int): (Long, Long) = {
      val docs = corpus(n)
      var pairCount = 0L
      val records = shuffleRecords {
        val sigs = docs.select(col("doc_id"),
          minhash(shingles(tokens(col("text"))), k = 32).as("sig")).persist()
        val (res, caches) = Dedup.lshPairsFromSigs(sigs)
        pairCount = res.count()
        (sigs +: caches).foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
      }
      (records, pairCount)
    }
    val (r1, p1) = run(400)
    val (r2, p2) = run(800)
    // identical dup docs → identical signatures → est_jac 1.0; the
    // word-salad uniques can only produce a candidate via a band
    // collision, and the 0.5 agreement re-rank kills those
    assert(p1 == 4L && p2 == 4L,
      s"expected exactly the 4 constructed dup pairs, got $p1 / $p2")
    val ratio = r2.toDouble / r1.toDouble
    assert(ratio < 3.0,
      s"superlinear shuffle growth: $r1 -> $r2 records (ratio $ratio)")
    assert(r1 > 0 && r2 > r1,
      s"implausible shuffle measurements: $r1 -> $r2")
  }
}
