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
}
