package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{FakeCodec, MediaRow}

class MultimodalSpec extends SparkSuite {

  test("batched decode yields one meta row per media row, any batch size") {
    import spark.implicits._
    val media = (1L to 100L).map(i =>
      MediaRow(i, "img/x", Array.fill(i.toInt * 7 % 300)((i % 251).toByte)))
      .toDS().repartition(7)
    for (bs <- Seq(1, 8, 64, 1000)) {
      val metas = Multimodal.decodeMeta(media, batchSize = bs).collect()
      assert(metas.length == 100)
      val m = metas.find(_.media_id == 10L).get
      assert(m.n_bytes == 10 * 7 % 300)
      assert(m.width == (m.n_bytes % 256 + 1) && m.channels == 3)
    }
  }

  test("decode is a narrow op: partition count preserved") {
    import spark.implicits._
    val media = (1L to 50L).map(i => MediaRow(i, "a", Array[Byte](1, 2, 3)))
      .toDS().repartition(5)
    assert(Multimodal.decodeMeta(media).rdd.getNumPartitions == 5)
  }

  test("fake codec: resize caps bytes, frame sampling keeps every k-th") {
    val payload = Array.tabulate(1000)(_.toByte)
    assert(FakeCodec.resize(payload, 128).length == 128)
    assert(FakeCodec.resize(Array[Byte](1, 2), 128).length == 2)
    val frames = FakeCodec.sampleFrames(payload, frameSize = 100, every = 3)
    assert(frames.length == 4) // frames 0,3,6,9
    assert(frames.map(_._1) == Seq(0, 3, 6, 9)) // SOURCE chunk indices
    assert(frames.head._2.length == 100)
    assert(frames.head._2(0) == payload(0) && frames(1)._2(0) == payload(300))
  }

  test("channel means are per-channel byte means") {
    val p = Array[Byte](9, 0, 0, 3, 0, 0) // channel 0 bytes: 9, 3
    val (_, _, _, means) = FakeCodec.decode(p)
    assert(means(0) == 6.0 && means(1) == 0.0)
  }

  test("dhash: short payloads are total, not errors") {
    assert(FakeCodec.dhash64(Array.emptyByteArray) == 0L)
    assert(FakeCodec.dhash64(Array[Byte](7)) == 0L)
    assert(FakeCodec.dhash64(Array[Byte](1, 2)) == 1L) // one rising edge
    assert(FakeCodec.dhash64(Array[Byte](2, 1)) == 0L)
  }

  test("dhash is scale-robust: a 2x-stretched payload stays near") {
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val rnd = new scala.util.Random(77)
    val results = (0 until 20).map { _ =>
      val base = Array.fill(200)(rnd.nextInt(256).toByte)
      // "rescaled copy": each byte doubled (2x resolution, same image) —
      // gradients survive, bytes don't
      val stretched = base.flatMap(b => Array(b, b))
      val other = Array.fill(200)(rnd.nextInt(256).toByte)
      val near = hamming(FakeCodec.dhash64(base), FakeCodec.dhash64(stretched))
      val far = hamming(FakeCodec.dhash64(base), FakeCodec.dhash64(other))
      (near, far)
    }
    // resampling jitter costs a few bits; unrelated payloads sit near the
    // 32-bit random expectation — the gap is what makes mm5's banding work
    assert(results.forall(_._1 <= 16),
      s"stretched copies too far: ${results.map(_._1)}")
    assert(results.map(_._2).sum / 20 >= 24,
      s"random pairs too close on average: ${results.map(_._2)}")
  }

  test("frame energies: exact integer sums, ragged tail, unsigned bytes") {
    val p = Array[Byte](3, 4, -1, 2) // -1 reads as 255 unsigned
    val fe = FakeCodec.frameEnergies(p, frameSize = 3)
    assert(fe == Seq((0, 9L + 16L + 255L * 255L, 3), (1, 4L, 1)))
    assert(FakeCodec.frameEnergies(Array.emptyByteArray, 3).isEmpty)
  }

  test("mm8 VAD: segments are maximal speech runs, silence-only items kept") {
    import spark.implicits._
    // frame energy is controlled by byte choice: 'z' (122, Σb²/n ≈ 14.9k)
    // is speech at thr 10000, SPACE (32, ≈1k) is silence; 32-byte frames
    def payload(pattern: String): Array[Byte] =
      pattern.flatMap(c => Seq.fill(32)(c)).map(_.toByte).toArray
    val media = Seq(
      MediaRow(1L, "aud/x", payload("zz z")),  // runs: 2, 1 speech frames
      MediaRow(2L, "aud/x", payload("  ")),    // silence only
      MediaRow(3L, "aud/x", payload("zzz"))    // one full run
    ).toDS()
    val frames = Multimodal.audioFrameEnergies(media, frameSize = 32).toDF()
    import org.apache.spark.sql.functions._
    val got = frames
      .withColumn("speech", col("sum_sq") >= lit(10000L) * col("n_bytes"))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n"), sum(when(col("speech"), 1L).otherwise(0L)).as("sp"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> (4L, 3L), 2L -> (2L, 0L), 3L -> (3L, 3L)))
    val vad = SparkEntry.queries("mm8_audio_vad")(
      spark, "/root/testdata/sf0.001").collect()
    // every item appears (silence-only rows emit 0/0/0, not vanish) and
    // invariants hold: speech ≤ frames, segments ≤ speech, max ≤ speech
    assert(vad.forall { r =>
      val (n, sp, seg, mx) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      sp <= n && seg <= sp && mx <= sp && (seg == 0) == (sp == 0)
    })
    assert(vad.exists(_.getLong(3) > 1), "some item should have ≥2 segments")
  }

  test("mm10 clip filter: unit-norm encoder, deterministic, non-vacuous") {
    import graft.multimodal.Multimodal.FakeCodec
    // kernel: L2-normalized output, deterministic, content-sensitive
    val a = FakeCodec.clipEmbed("the quick brown fox".getBytes("UTF-8"))
    val b = FakeCodec.clipEmbed("the quick brown fox".getBytes("UTF-8"))
    val c = FakeCodec.clipEmbed("a completely different caption".getBytes("UTF-8"))
    assert(a.length == 64 && a.sameElements(b), "encoder must be deterministic")
    assert(!a.sameElements(c), "encoder must be content-sensitive")
    assert(math.abs(a.map(x => x * x).sum - 1.0) < 1e-12, "unit norm")
    assert(FakeCodec.clipEmbed(Array.emptyByteArray).forall(_ == 0.0),
      "empty payload embeds to the zero vector, not NaN")

    // the gated frame: one row per media item, both decisions present,
    // and clip_sim within [-1, 1] (a dot of two unit vectors)
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("mm10_clip_filter")(spark, dir).collect()
    assert(rows.length == Tables.documents(spark, dir).count())
    assert(rows.exists(_.getBoolean(2)) && rows.exists(!_.getBoolean(2)),
      "keep/drop split is vacuous — threshold no longer separates")
    assert(rows.forall(r => math.abs(r.getDouble(1)) <= 1.0 + 1e-12))
  }

  test("real decoder through the seam: javax.imageio decodes PNG/JPEG in mm1's call site") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // a real 4×3 RGB PNG with KNOWN pixels: channel c of pixel (x, y)
    // is a distinct value, so the expected per-band means are computed
    // independently of any decoder
    val (w, h) = (4, 3)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    def px(x: Int, y: Int, c: Int) = (40 * c + 16 * y + 4 * x) % 256
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y,
        (px(x, y, 0) << 16) | (px(x, y, 1) << 8) | px(x, y, 2))
    def bytesOf(fmt: String, i: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(i, fmt, bos), s"no $fmt writer in this JDK")
      bos.toByteArray
    }
    val png = bytesOf("png", img)
    val jpg = bytesOf("jpg", img)
    val expectedMeans = (0 until 3).map { band =>
      (for (y <- 0 until h; x <- 0 until w) yield px(x, y, band))
        .sum.toDouble / (w * h)
    }
    // the flag selects the REAL codec; the payloads flow through
    // decodeMeta — mm1's exact batched mapPartitions call site
    spark.conf.set("spark.graft.codec", "imageio")
    try {
      assert(Multimodal.codecFor(spark) eq Multimodal.ImageIoCodec)
      val media = Seq(
        MediaRow(1L, "image", png),
        MediaRow(2L, "image", jpg)).toDS().repartition(2)
      val meta = Multimodal
        .decodeMeta(media, batchSize = 1, codec = Multimodal.codecFor(spark))
        .collect().sortBy(_.media_id)
      // PNG is lossless: dims, band count AND per-band means are exact.
      // (ImageIO rasters are RGB-band-ordered for TYPE_3BYTE_BGR reads
      // of PNG output — band b == channel c of setRGB above.)
      val p = meta(0)
      assert((p.width, p.height, p.channels) == (w, h, 3))
      assert(p.channel_means.toSeq == expectedMeans,
        s"PNG band means ${p.channel_means.toSeq} != $expectedMeans")
      // JPEG is lossy: dims/bands exact, means near the PNG truth
      val j = meta(1)
      assert((j.width, j.height, j.channels) == (w, h, 3))
      j.channel_means.zip(expectedMeans).foreach { case (got, want) =>
        assert(math.abs(got - want) < 20.0,
          s"JPEG band mean $got too far from $want")
      }
      // corrupt bytes fail LOUDLY, not as fake metadata
      val boom = intercept[org.apache.spark.SparkException] {
        Multimodal.decodeMeta(
          Seq(MediaRow(3L, "image", Array[Byte](1, 2, 3))).toDS(),
          codec = Multimodal.codecFor(spark)).collect()
      }
      assert(boom.getMessage != null)
    } finally spark.conf.unset("spark.graft.codec")
    // flag off: the gate's deterministic stand-in is back
    assert(Multimodal.codecFor(spark) eq Multimodal.FakeCodec)
  }

  test("real audio decoder through the seam: javax.sound.sampled WAV " +
    "decodes in mm8's call site and VAD segments it exactly") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}
    // a real RIFF/WAV container around KNOWN 16-bit mono PCM samples
    def wavOf(samples: Array[Short]): Array[Byte] = {
      val fmt = new AudioFormat(8000f, 16, 1, true, false) // 16-bit LE mono
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt,
          samples.length.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // 32-sample frames: [0,1]=silence, [2,3,4]=loud ±12345, [5]=silence,
    // [6]=ragged 16-sample loud tail → speech frames {2,3,4,6}, two
    // segments, longest 3
    val loud: Short = 12345
    def loudRun(n: Int): Array[Short] =
      Array.tabulate(n)(i => if (i % 2 == 0) loud else (-loud).toShort)
    val samples = Array.fill[Short](64)(0) ++ loudRun(96) ++
      Array.fill[Short](32)(0) ++ loudRun(16)
    val wav = wavOf(samples)
    // kernel: the decoder recovers the EXACT samples from the container
    assert(Multimodal.WavCodec.decodePcm16(wav).toSeq ==
      samples.map(_.toInt).toSeq)
    // energies are exact integer Σ s² per 32-SAMPLE frame
    val fe = Multimodal.WavCodec.frameEnergies(wav, frameSize = 32)
    val loudE = 32L * loud * loud
    assert(fe == Seq((0, 0L, 32), (1, 0L, 32), (2, loudE, 32),
      (3, loudE, 32), (4, loudE, 32), (5, 0L, 32),
      (6, 16L * loud * loud, 16)))
    // the flag selects the REAL audio codec through mm8's exact batched
    // call site; vadProfile (mm8's gated segmentation, verbatim) then
    // segments the decoded energies at the CODEC'S OWN threshold
    // (vadThrPerUnit, in sample² units — exactly what mm8 passes): the
    // ±12345 "loud" run (≈152.4e6/sample) must read as speech and the
    // zero run as silence under the codec-selected constant, proving
    // the threshold travels with the decode unit (ADVICE r10)
    spark.conf.set("spark.graft.codec", "wav")
    try {
      val codec = Multimodal.audioCodecFor(spark)
      assert(codec eq Multimodal.WavCodec)
      assert(codec.vadThrPerUnit == 150000000L,
        "WavCodec threshold must be sample²-scaled, not byte²-scaled")
      val media = Seq(
        MediaRow(1L, "aud/wav", wav),
        MediaRow(2L, "aud/wav", wavOf(Array.fill[Short](64)(0)))).toDS()
      val frames = Multimodal.audioFrameEnergies(media, frameSize = 32,
        codec = codec).toDF()
      val prof = graft.queries.MultimodalQueries
        .vadProfile(frames, thrPerUnit = codec.vadThrPerUnit)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      assert(prof == Map(
        1L -> ((7L, 4L, 2L, 3L)),
        2L -> ((2L, 0L, 0L, 0L))),
        s"VAD profile mismatch: $prof")
      // corrupt bytes fail LOUDLY, not as fake energies
      val boom = intercept[org.apache.spark.SparkException] {
        Multimodal.audioFrameEnergies(
          Seq(MediaRow(3L, "aud/wav", Array[Byte](1, 2, 3))).toDS(),
          frameSize = 32, codec = Multimodal.audioCodecFor(spark)).collect()
      }
      assert(boom.getMessage != null)
      // a TRUNCATED wav (valid header, data chunk cut mid-stream — the
      // corrupt object-store PUT) must also fail loudly: the header
      // declares more frames than the payload delivers, and a silently
      // short energy profile is the poisoned-VAD outcome the codec
      // contract rejects
      val cut = intercept[IllegalArgumentException] {
        Multimodal.WavCodec.decodePcm16(wav.dropRight(31))
      }
      assert(cut.getMessage.contains("truncated WAV"), cut.getMessage)
      // both real codecs coexist: the conf is a comma-set, so enabling
      // wav must not silently downgrade the image seam (or vice versa)
      spark.conf.set("spark.graft.codec", "imageio,wav")
      assert(Multimodal.audioCodecFor(spark) eq Multimodal.WavCodec)
      assert(Multimodal.codecFor(spark) eq Multimodal.ImageIoCodec)
    } finally spark.conf.unset("spark.graft.codec")
    // flag off: the gate's deterministic stand-in is back
    assert(Multimodal.audioCodecFor(spark) eq Multimodal.FakeCodec)
  }

  test("real video container through the seam: MJPEG frames decode in " +
    "mm4/mm11/mm13's call sites; duplicate frames group exactly") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // four REAL JPEG frames: 0 and 2 are encodes of the SAME image
    // (identical bytes — the static intro/outro pattern mm11 exists to
    // catch), 1 and 3 are distinct; concatenated = a Motion-JPEG stream
    def jpegOf(seed: Int, w: Int = 6, h: Int = 5): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (seed * 37 + 16 * y + 4 * x) % 256
        img.setRGB(x, y, (v << 16) | (((v + seed) % 256) << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, "jpg", bos), "no jpg writer in this JDK")
      bos.toByteArray
    }
    val still = jpegOf(1)
    val frames = Seq(still, jpegOf(2), still, jpegOf(3))
    val payload = frames.flatten.toArray
    val codec = Multimodal.MjpegCodec
    // the container parser recovers the EXACT frame boundaries (the
    // segment walk, not a naive EOI scan: JPEG headers are length-
    // prefixed and entropy data is byte-stuffed)
    val got = codec.frames(payload, frameSize = 0)
    assert(got.length == 4)
    got.zip(frames).zipWithIndex.foreach { case ((g, want), i) =>
      assert(java.util.Arrays.equals(g, want), s"frame $i bytes diverge")
    }
    // each frame decodes through the SAME JDK decoder as the image seam
    // with known dims, and energy is the exact Σ sample² with n = w·h·bands
    val (ss0, n0) = codec.frameEnergy(still)
    assert(n0 == 6 * 5 * 3 && ss0 > 0L)
    assert(codec.frameEnergy(got(2)) == ((ss0, n0)),
      "identical frames must report identical energies")
    assert(codec.frameEnergy(got(1)) != ((ss0, n0)),
      "distinct frames should not collide in energy on this fixture")
    // a frame with an APP segment CONTAINING the EOI byte pair must not
    // be truncated by the walker (the naive scan's failure mode): splice
    // a COM segment whose body is FFD9 right after SOI
    val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0x00, 0x04,
      0xff.toByte, 0xd9.toByte)
    val tricky = still.take(2) ++ com ++ still.drop(2)
    assert(codec.frameEnd(tricky, 0) == tricky.length,
      "segment walker truncated at an embedded FFD9")
    // garbage and truncation fail LOUDLY, never as silent mis-framing
    intercept[IllegalArgumentException] {
      codec.frames(Array[Byte](1, 2, 3), 0)
    }
    intercept[IllegalArgumentException] {
      codec.frames(payload.dropRight(3), 0)
    }
    // through the seam: the flag selects MJPEG in mm4/mm11's exact
    // batched call site; mm11's md5-of-frame-bytes dedup groups the two
    // identical frames and nothing else
    spark.conf.set("spark.graft.codec", "mjpeg")
    try {
      assert(Multimodal.videoCodecFor(spark) eq Multimodal.MjpegCodec)
      val media = Seq(MediaRow(1L, "vid/mjpeg", payload),
        MediaRow(2L, "vid/mjpeg", jpegOf(4) ++ still)).toDS()
      val fr = Multimodal.sampleFrameRows(media, frameSize = 32, every = 1,
        codec = Multimodal.videoCodecFor(spark)).toDF()
      import org.apache.spark.sql.functions._
      val groups = fr
        .select(col("media_id"), col("frame_idx"), md5(col("frame")).as("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), countDistinct("media_id").as("nm"))
        .filter(col("n") >= 2)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      // exactly ONE duplicated frame key: the still, 3 occurrences
      // (item 1 twice, item 2 once) across 2 media items
      assert(groups.toSeq == Seq((3L, 2L)), s"dup groups: ${groups.toSeq}")
      // mm13's energy seam: sample² energies for every frame, and the
      // FakeCodec spelling is untouched — same payload through the gate
      // default equals the audio-energy arithmetic exactly
      val e = Multimodal.videoFrameEnergies(media, frameSize = 32,
        codec = Multimodal.videoCodecFor(spark)).collect()
      assert(e.count(_.media_id == 1L) == 4 && e.forall(_.n_bytes == n0))
    } finally spark.conf.unset("spark.graft.codec")
    assert(Multimodal.videoCodecFor(spark) eq Multimodal.FakeCodec)
    val fakeV = Multimodal.videoFrameEnergies(
      Seq(MediaRow(9L, "vid", payload)).toDS(), frameSize = 32).collect()
      .map(f => (f.frame_idx, f.sum_sq, f.n_bytes)).sortBy(_._1).toSeq
    val fakeA = Multimodal.audioFrameEnergies(
      Seq(MediaRow(9L, "aud", payload)).toDS(), frameSize = 32).collect()
      .map(f => (f.frame_idx, f.sum_sq, f.n_bytes)).sortBy(_._1).toSeq
    assert(fakeV == fakeA,
      "gate-default video energies must equal the audio byte² arithmetic")
  }
}
