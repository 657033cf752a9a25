package graft

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.{HeavyHitters, MisraGries}

/** The Misra–Gries completeness guarantee t25 rests on: after any
  * interleaving of reduce/merge/compact, every key with true count
  * > N/(m+1) is present in the summary — so the two-pass heavy-hitter
  * output (exact counts over candidates, filter ≥ T > N/(m+1)) equals
  * the sketch-free GROUP BY … HAVING.
  */
class HeavyHittersSpec extends SparkSuite {

  test("MG summary keeps every key above N/(m+1) under skewed input") {
    val m = 16
    val mg = new MisraGries(m)
    val rnd = new Random(7)
    // 2 genuinely hot keys + a long uniform tail of 500 cold keys
    val stream = rnd.shuffle(
      Seq.fill(400)("hot1") ++ Seq.fill(250)("hot2") ++
        (0 until 2000).map(i => s"cold${i % 500}"))
    val n = stream.length
    val buf = stream.foldLeft(mg.zero)(mg.reduce)
    val cands = mg.finish(buf)
    assert(cands.size <= m)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
    exact.filter(_._2 > n.toDouble / (m + 1)).keys.foreach { k =>
      assert(cands.contains(k), s"heavy key $k lost (bound ${n / (m + 1)})")
    }
  }

  test("guarantee survives arbitrary merge trees") {
    val m = 8
    val mg = new MisraGries(m)
    val rnd = new Random(11)
    val stream = rnd.shuffle(
      Seq.fill(300)("a") ++ Seq.fill(200)("b") ++
        (0 until 1500).map(i => s"z${i % 400}"))
    // partition into 7 uneven chunks, reduce each, merge pairwise
    val bufs = stream.grouped(stream.length / 7 + 1)
      .map(chunk => chunk.foldLeft(mg.zero)(mg.reduce))
      .toSeq
    val merged = bufs.reduce { (x, y) =>
      mg.merge(x, mutable.Map(y.toSeq: _*))
    }
    val cands = mg.finish(merged)
    val n = stream.length
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
    exact.filter(_._2 > n.toDouble / (m + 1)).keys.foreach { k =>
      assert(cands.contains(k), s"heavy key $k lost after merge")
    }
  }

  test("guarantee holds across randomized streams, m, and merge order") {
    val rnd = new Random(23)
    for (trial <- 0 until 15) {
      val m = 4 + rnd.nextInt(60)
      val nHot = 1 + rnd.nextInt(4)
      val hot = (0 until nHot)
        .flatMap(h => Seq.fill(150 + rnd.nextInt(400))(s"hot$h"))
      val tailKeys = 50 + rnd.nextInt(800)
      val tail = (0 until 500 + rnd.nextInt(3000)).map(i => s"c${i % tailKeys}")
      val stream = rnd.shuffle(hot ++ tail)
      val mg = new MisraGries(m)
      val chunkLen = 1 + rnd.nextInt(stream.length / 2 + 1)
      var bufs = rnd.shuffle(
        stream.grouped(chunkLen)
          .map(c => c.foldLeft(mg.zero)(mg.reduce)).toSeq)
      while (bufs.size > 1) {
        // random pairwise merges in random order (copies: merge mutates)
        val merged = mg.merge(mutable.Map(bufs(0).toSeq: _*),
          mutable.Map(bufs(1).toSeq: _*))
        bufs = rnd.shuffle(merged +: bufs.drop(2))
      }
      val cands = mg.finish(bufs.head)
      assert(cands.size <= m, s"trial $trial: ${cands.size} > $m")
      val n = stream.length
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
      exact.filter(_._2 > n.toDouble / (m + 1)).keys.foreach { k =>
        assert(cands.contains(k),
          s"trial $trial (m=$m, n=$n): heavy key $k lost")
      }
    }
  }

  test("two-pass output == plain groupBy HAVING on a Spark frame") {
    val s = spark
    import s.implicits._
    val rnd = new Random(3)
    val keys = rnd.shuffle(
      Seq.fill(120)("alpha") ++ Seq.fill(80)("beta") ++
        (0 until 600).map(i => s"k${i % 150}"))
    val df = keys.toDF("k").repartition(5)
    val row = df.agg(HeavyHitters.mgCandidates(col("k"), 64).as("c"),
      count(lit(1)).as("n")).head()
    val cands = row.getSeq[String](0)
    val n = row.getLong(1)
    val thr = math.max(2L, math.ceil(0.05 * n).toLong) // > n/65 for this n
    assert(thr > n.toDouble / 65)
    val got = df.join(broadcast(cands.toDF("k")), "k")
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thr)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = keys.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= thr).toMap
    assert(got == want)
  }
}
