package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Checkpoints
import graft.streaming.{NearDupStream, SummaryStream, VectorStream}

/** Streaming-STATE scale rehearsal (VERDICT r10 ask #4): the streaming
  * twins are parity-pinned by StreamingSpec at toy batch sizes, but the
  * O(·) claims on their state — O(ingested index) for the near-dup
  * screen, O(|cells|) for the IVF occupancy, O(|key bins|) for the
  * summary — had never been driven past toy volume. This tool streams
  * the ×N rehearsal corpus (built by `ScaleRehearsal N`) through each
  * twin as a real FILE STREAM (`maxFilesPerTrigger`-paced micro-batches)
  * and records, per batch: wall latency and the state size — then
  * ASSERTS the bounded-state claims instead of narrating them:
  *
  *  - VectorStream.cellCounts: state-store rows == live cells, must
  *    stay ≤ the centroid count whatever the stream volume;
  *  - SummaryStream: summary rows == |lang × source| bins, flat across
  *    batches once all bins are seen;
  *  - NearDupStream.PairScreen: postings ≤ 16·(docs ingested) and grow
  *    ~linearly (it IS a dedup index — O(corpus) by design, the claim
  *    is the CONSTANT, not sublinearity); the recorded latency curve is
  *    the honest price of the self-contained per-trigger occupancy
  *    re-aggregate (the documented production fix is band-bucketed
  *    postings layout, `NearDupStream` Scaladoc).
  *
  * NOT a gate: results land in BASELINE.md; report at
  * `target/rehearsal/stream_<src>/report.json`.
  *
  * Usage: runMain graft.tools.StreamRehearsal [srcDir]
  *   (default target/rehearsal/sf0.1x10 — run `ScaleRehearsal 10` first)
  */
object StreamRehearsal {

  private def fmt(t: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, t)

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("target/rehearsal/sf0.1x10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = "target/rehearsal/stream_" +
      new java.io.File(src).getName
    // SPARK_GRAFT_MASTER=local-cluster[n,c,mem] runs the same stream
    // rehearsal with executors in separate JVMs (ScaleRehearsal's
    // launch facts apply: export SPARK_SCALA_VERSION, executor memory
    // derived from the master string's worker field)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster")) {
      val classes = Seq("target/scala-2.13/classes")
        .map(p => new java.io.File(p).getAbsolutePath)
        .filter(p => new java.io.File(p).isDirectory)
        .mkString(java.io.File.pathSeparator)
      builder.config("spark.executor.extraClassPath", classes)
      val workerMb = master.split("[\\[\\],]")(3).trim
      builder.config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", s"${workerMb}m"))
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val report = new StringBuilder
    report ++= s"""{"src":"$src","""

    // ---- 1. IVF occupancy (VectorStream): state must stay O(cells) ----
    {
      val embPath = s"$src/embeddings.parquet"
      val schema = spark.read.parquet(embPath).schema
      // the fixed quantizer: s4's anchor-stride stand-in at the same
      // corpus-bounded stride the batch tier derives (nlist ≤ 1024),
      // plain-dot form — collected ONCE as the index-build artifact (KBs)
      val nAll = spark.read.parquet(embPath).count()
      val st = graft.queries.Similarity.anchorStride(
        nAll, graft.queries.Similarity.IvfNListBound)
      val cents = spark.read.parquet(embPath)
        .filter(col("vec_id") % st === 0)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("u"))
        .collect()
        .map(r => (r.getLong(0),
          r.getSeq[Double](1).toSeq))
        .toSeq
      val vecs = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4).parquet(embPath)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("unit"))
      import spark.implicits._
      val counts = VectorStream.cellCounts(
        VectorStream.assignAgainst(vecs, cents, kmeansObjective = false)
          .select(col("cent_id")).as[Long])
      val ckpt = s"$out/ckpt_vec_${System.nanoTime()}"
      val q = counts.writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .format("noop")
        .start()
      q.processAllAvailable()
      val progress = q.recentProgress.toSeq
        .filter(_.numInputRows > 0)
      val stateRows = progress.map(_.stateOperators.head.numRowsTotal)
      val batchMs = progress.map(_.batchDuration)
      q.stop()
      val nVecs = spark.read.parquet(embPath).count()
      require(stateRows.nonEmpty && stateRows.max <= cents.length,
        s"IVF state grew past the cell count: ${stateRows.max} cells " +
          s"for ${cents.length} centroids")
      report ++= s""""vector_stream":{"n_vecs":$nVecs,"cells":${cents.length},"""
      report ++= s""""state_rows_curve":[${stateRows.mkString(",")}],"""
      report ++= s""""batch_ms_curve":[${batchMs.mkString(",")}]},"""
    }

    // ---- 2. Summary maintenance: state must stay O(bins) ----
    {
      val docsPath = s"$src/documents.parquet"
      val schema = spark.read.parquet(docsPath).schema
      val rows = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4).parquet(docsPath)
        .select("lang", "source", "n_chars")
      val state = new SummaryStream.SummaryState(
        keys = Seq("lang", "source"), measures = Seq("n_chars"))
      val curve = ArrayBuffer.empty[(Double, Long)]
      val q = rows.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          val t0 = System.nanoTime()
          state.ingest(batch, id)
          val bins = state.snapshot.map(_.count()).getOrElse(0L)
          curve += (((System.nanoTime() - t0) / 1e9, bins))
          ()
        }
        .outputMode("append")
        .start()
      q.processAllAvailable()
      q.stop()
      val nBins = curve.last._2
      // lang × source on this corpus: ≤ 6 langs × 20 sources
      require(curve.forall(_._2 <= 120L),
        s"summary state grew past the bin space: ${curve.map(_._2)}")
      state.close()
      report ++= s""""summary_stream":{"final_bins":$nBins,"""
      report ++= s""""batch_sec_curve":[${curve.map(c => fmt(c._1)).mkString(",")}],"""
      report ++= s""""bins_curve":[${curve.map(_._2).mkString(",")}]},"""
    }

    // ---- 3. Near-dup ingest screen: index state, linear in corpus ----
    {
      val docsPath = s"$src/documents.parquet"
      val schema = spark.read.parquet(docsPath).schema
      val docs = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4).parquet(docsPath)
        .select("doc_id", "text")
      val screen = new NearDupStream.PairScreen(spark, cap = 300)
      // (sec, pairs, postings, sigs, docs_so_far) per batch
      val curve = ArrayBuffer.empty[(Double, Long, Long, Long, Long)]
      var docsSeen = 0L
      val q = docs.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val t0 = System.nanoTime()
          val pairs = screen.ingest(batch)
          val np = try pairs.count() finally Checkpoints.free(pairs)
          val sec = (System.nanoTime() - t0) / 1e9
          docsSeen += batch.count()
          val (p, s) = screen.stateSizes
          curve += ((sec, np, p, s, docsSeen))
          ()
        }
        .outputMode("update")
        .start()
      q.processAllAvailable()
      q.stop()
      // the index claim: postings ≤ bands × docs (cap only shrinks it),
      // one signature per admitted doc
      require(curve.forall(c => c._3 <= 16L * c._5 && c._4 <= c._5),
        s"screen state above its bound: ${curve.toSeq}")
      screen.close()
      report ++= s""""neardup_stream":{"docs":$docsSeen,"""
      report ++= s""""pairs_total":${curve.map(_._2).sum},"""
      report ++= s""""batch_sec_curve":[${curve.map(c => fmt(c._1)).mkString(",")}],"""
      report ++= s""""postings_curve":[${curve.map(_._3).mkString(",")}],"""
      report ++= s""""sigs_curve":[${curve.map(_._4).mkString(",")}]}}"""
    }

    println(report.toString)
    val f = java.nio.file.Paths.get(s"$out/report.json")
    java.nio.file.Files.createDirectories(f.getParent)
    java.nio.file.Files.write(f, (report.toString + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[rehearsal] stream report written to $f")
    spark.stop()
  }
}
