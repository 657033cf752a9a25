package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.functions.TextFunctions.tokens

/** Top-level so the MemoryStream encoder derives cleanly. */
case class HllDocRow(doc_id: Long, lang: String, source: String, text: String)

/** The properties dd13's shard-sketch rollup rests on (see Dedup.scala).
  *
  * The 100 TB pattern is: each ingest shard writes its per-group HLL
  * sketch (a ~16 KB binary) beside its data; corpus-wide distinct counts
  * are then unions of SKETCHES — kilobytes moved, no rescan of the text.
  * That is only sound if (1) a rollup of shard sketches equals the sketch
  * built directly over the union, (2) sketches survive a parquet
  * round-trip intact, (3) union has set semantics (overlapping shards
  * don't double-count), and (4) the estimates actually sit inside the
  * advertised error envelope on real data. Each test pins one of these.
  */
class HllSketchSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"

  private def sh = graft.queries.Dedup.sourceShingles(spark, dir)

  /** Direct one-level per-source sketch estimate (no shard rollup). */
  private def direct = sh.groupBy("source")
    .agg(hll_sketch_estimate(hll_sketch_agg(col("shingle"), 14)).as("n_est"))

  private def collectMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("two-level shard rollup == direct sketch, estimate-exact") {
    val rolled = collectMap(
      graft.queries.Dedup.hllEstFromShingles(sh))
    val one = collectMap(direct)
    assert(rolled === one,
      "hll_union_agg of per-(source,lang) sketches must reproduce the " +
        "single-pass sketch exactly — HLL register state is a per-bucket " +
        "max, so the two orders see identical registers")
  }

  test("sketches round-trip through a parquet binary column") {
    val tmp = java.nio.file.Files.createTempDirectory("hll_rt_").toFile
    try {
      val shardPath = tmp.getAbsolutePath + "/shard_sketches"
      sh.groupBy("source", "lang")
        .agg(hll_sketch_agg(col("shingle"), 14).as("sk"))
        .write.mode("overwrite").parquet(shardPath)
      val rolled = collectMap(
        spark.read.parquet(shardPath)
          .groupBy("source")
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_est")))
      assert(rolled === collectMap(direct),
        "persisted shard sketches must union to the same estimates — " +
          "this is the no-rescan incremental accounting claim")
    } finally graft.util.Fs.rmTree(tmp)
  }

  test("union is set-semantics: overlapping shards don't double-count") {
    // two shards with heavy overlap: all docs vs the even half of docs
    val all = sh.select(col("shingle"))
    val half = Tables.documents(spark, dir)
      .filter(col("doc_id") % 2 === 0)
      .select(explode(graft.functions.HashFunctions.shingles(
        tokens(col("text")))).as("shingle"))
    val unioned = all.select(hll_sketch_agg(col("shingle"), 14).as("sk"))
      .unionAll(half.select(hll_sketch_agg(col("shingle"), 14).as("sk")))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .head().getLong(0)
    val straight = all
      .agg(hll_sketch_estimate(hll_sketch_agg(col("shingle"), 14)).as("e"))
      .head().getLong(0)
    assert(unioned === straight,
      "half's shingles are a subset of all's, so the union sketch must " +
        "equal the all-shingles sketch — duplicates never raise registers")
  }

  test("ingest-stream shard sketches roll up to the batch estimates") {
    // the pattern dd13 documents, run LITERALLY as an ingest stream:
    // docs arrive in micro-batches, foreachBatch appends one sketch
    // parquet shard per batch (the per-shard stats a 100 TB ingest
    // writes beside its data), and the corpus-wide distinct counts are
    // a union over the accumulated shard files — never a rescan. Must
    // equal the batch-mode estimates exactly: HLL registers are
    // per-bucket maxima, so arrival order and batch boundaries are
    // invisible.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "lang", "source", "text")
      .as[HllDocRow].collect().sortBy(_.doc_id)
    val tmp = java.nio.file.Files.createTempDirectory("hll_stream_").toFile
    try {
      val shardDir = tmp.getAbsolutePath + "/shards"
      val mem = MemoryStream[HllDocRow]
      val q = mem.toDS().writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[HllDocRow], _: Long) =>
          batch.toDF()
            .select(col("source"), col("lang"),
              explode(graft.functions.HashFunctions.shingles(
                tokens(col("text")))).as("shingle"))
            .groupBy("source", "lang")
            .agg(hll_sketch_agg(col("shingle"), 14).as("sk"))
            .write.mode("append").parquet(shardDir)
          ()
        }
        .start()
      docs.grouped(docs.length / 3 + 1).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      q.stop()
      val streamed = collectMap(
        spark.read.parquet(shardDir)
          .groupBy("source")
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_est")))
      assert(streamed === collectMap(direct),
        "stream-accumulated shard sketches diverged from the batch " +
          "sketch — batch boundaries must be invisible to HLL state")
    } finally graft.util.Fs.rmTree(tmp)
  }

  test("estimates sit inside the 2.5% envelope vs exact, per source") {
    val rows = SparkEntry.queries("dd13_hll_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, exact, est, ok) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))
      assert(ok, s"$src: |$est - $exact| exceeds 2.5% of exact — at " +
        "lgK=14 (~0.8% std err) this is a >3 sigma event; suspect the " +
        "sketch pipeline, not luck")
    }
  }
}
