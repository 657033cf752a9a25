package graft

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Units
import graft.functions.MisraGries

/** Property-based laws for the pure driver-side kernels whose guarantees
  * the distributed operators lean on:
  *
  *   - Misra–Gries (t25's pass 1, SketchStream's shard state): the
  *     heavy-hitter completeness bound — no key with frequency
  *     > N/(m+1) may be absent from the candidates — must hold for ANY
  *     stream, ANY partitioning of it, and ANY merge order, because
  *     Spark chooses all three at runtime (task boundaries, partial-agg
  *     tree shape) and correctness must not depend on them.
  *   - Units algebra (g7's conversion factors): group laws — inverse
  *     round-trip, transitive composition — over randomly chosen
  *     compatible units; the laws are what make registry-declared and
  *     user-requested units safely composable at query time.
  *
  * The RegularGridPropSpec harness (100 random cases per law).
  */
class KernelPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  // ---- Misra–Gries ----

  /** Zipf-ish streams: a few hot keys over a long tail, the regime MG
    * exists for. Small m forces constant compaction.
    */
  private val streamGen: Gen[(List[String], Int)] = for {
    n <- Gen.choose(50, 2000)
    hot <- Gen.choose(1, 4)
    m <- Gen.choose(2, 16)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    val s = List.fill(n) {
      val r = rnd.nextInt(100)
      if (r < 60) s"hot_${rnd.nextInt(hot)}"        // heavy mass
      else s"tail_${rnd.nextInt(n)}"                // long tail
    }
    (s, m)
  }

  /** Random partitioning + left-fold merge of per-part buffers — the
    * shape of Spark's partial/final aggregation with arbitrary task
    * boundaries.
    */
  private def mgCandidates(stream: List[String], m: Int,
      parts: Int, seed: Long): Set[String] = {
    val mg = new MisraGries(m)
    val rnd = new scala.util.Random(seed)
    val buckets = Array.fill(parts)(mutable.ListBuffer.empty[String])
    stream.foreach(k => buckets(rnd.nextInt(parts)) += k)
    val partials = buckets.toSeq.map(b =>
      b.foldLeft(mg.zero)((acc, k) => mg.reduce(acc, k)))
    mg.finish(partials.reduceLeft(mg.merge)).toSet
  }

  test("MG completeness: every key above N/(m+1) survives any partitioning") {
    check(Prop.forAll(streamGen, Gen.choose(1, 8),
        Gen.choose(0L, Long.MaxValue)) { case ((stream, m), parts, seed) =>
      val cands = mgCandidates(stream, m, parts, seed)
      val n = stream.length
      val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
      val heavy = exact.collect {
        case (k, c) if c.toDouble > n.toDouble / (m + 1) => k
      }.toSet
      val lost = heavy -- cands
      Prop(lost.isEmpty) :| s"lost heavy keys $lost (n=$n m=$m)"
    })
  }

  test("MG candidate set honors the <= m size contract after finish") {
    check(Prop.forAll(streamGen, Gen.choose(1, 8),
        Gen.choose(0L, Long.MaxValue)) { case ((stream, m), parts, seed) =>
      val cands = mgCandidates(stream, m, parts, seed)
      Prop(cands.size <= m) :| s"${cands.size} candidates > m=$m"
    })
  }

  test("MG is partitioning-invariant in its guarantee, sequential == merged " +
      "on hot keys") {
    check(Prop.forAll(streamGen, Gen.choose(2, 8),
        Gen.choose(0L, Long.MaxValue)) { case ((stream, m), parts, seed) =>
      // the candidate SETS may differ between partitionings (ties near
      // the bound), but both must contain every provably-heavy key —
      // the property consumers (t25 pass-2) rely on
      val seq = mgCandidates(stream, m, 1, seed)
      val par = mgCandidates(stream, m, parts, seed)
      val n = stream.length
      val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
      val heavy = exact.collect {
        case (k, c) if c.toDouble > n.toDouble / (m + 1) => k
      }.toSet
      Prop(heavy.subsetOf(seq) && heavy.subsetOf(par)) :|
        s"heavy=$heavy seq=$seq par=$par"
    })
  }

  // ---- clipEmbed (mm10's stub vision tower) ----

  private val payloadGen: Gen[Array[Byte]] = Gen.oneOf(
    Gen.const(Array.emptyByteArray),
    Gen.choose(0, 255).map(b => Array.fill(100)(b.toByte)), // uniform bytes
    for {
      n <- Gen.choose(1, 4000)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield {
      val rnd = new scala.util.Random(seed)
      Array.fill(n)(rnd.nextInt(256).toByte)
    })

  test("clipEmbed: 64 dims, norm exactly 0 or ~1, never NaN") {
    check(Prop.forAll(payloadGen) { p =>
      val e = graft.multimodal.Multimodal.FakeCodec.clipEmbed(p)
      val ss = e.map(x => x * x).sum
      val ok = e.length == 64 && !e.exists(_.isNaN) &&
        (ss == 0.0 || math.abs(ss - 1.0) < 1e-9)
      // uniform payloads center to exactly 128-mean per dim → zero
      // vector (the documented no-signal case), not NaN from 0/0
      Prop(ok) :| s"len=${p.length} ss=$ss"
    })
  }

  test("clipEmbed: uniform bytes embed to the zero vector (no signal)") {
    check(Prop.forAll(Gen.choose(1, 2000), Gen.choose(0, 255)) { (n, b) =>
      val e = graft.multimodal.Multimodal.FakeCodec
        .clipEmbed(Array.fill(n)(b.toByte))
      // every dim pools the same centered value v=b-128: v/1 per dim,
      // normalized → ±1/8 each — EXCEPT b=128 where all dims are 0
      if (b == 128) Prop(e.forall(_ == 0.0)) :| "128 must be silent"
      else Prop(math.abs(e.map(x => x * x).sum - 1.0) < 1e-9) :| s"b=$b"
    })
  }

  // ---- Units algebra ----

  /** Compatible unit families the registry declares (same dimension
    * within a family).
    */
  private val families: Seq[Seq[String]] = Seq(
    Seq("m", "km", "cm", "mm"),
    Seq("s", "min", "hr"),
    Seq("m/s", "km/s", "km/hr"),
    Seq("nPa", "Pa"))

  private val pairGen: Gen[(String, String, String)] = for {
    fam <- Gen.oneOf(families)
    a <- Gen.oneOf(fam); b <- Gen.oneOf(fam); c <- Gen.oneOf(fam)
  } yield (a, b, c)

  test("unit factors: inverse round-trip is 1 within ulps") {
    check(Prop.forAll(pairGen) { case (a, b, _) =>
      val f = Units.factor(a, b) * Units.factor(b, a)
      Prop(math.abs(f - 1.0) < 1e-12) :| s"$a<->$b round-trip $f"
    })
  }

  test("unit factors compose transitively: a->b->c == a->c within ulps") {
    check(Prop.forAll(pairGen) { case (a, b, c) =>
      val direct = Units.factor(a, c)
      val via = Units.factor(a, b) * Units.factor(b, c)
      val rel = math.abs(via - direct) / math.max(math.abs(direct), 1e-300)
      Prop(rel < 1e-12) :| s"$a->$b->$c via=$via direct=$direct"
    })
  }

  test("compatibility is symmetric within families, and factor(a,a) == 1") {
    check(Prop.forAll(pairGen) { case (a, b, _) =>
      Prop(Units.compatible(a, b) && Units.compatible(b, a) &&
        Units.factor(a, a) == 1.0) :| s"$a/$b compatibility"
    })
  }

  test("incompatible dimensions refuse a factor") {
    intercept[IllegalArgumentException] { Units.factor("m", "s") }
    intercept[IllegalArgumentException] { Units.factor("km/s", "nPa") }
  }
}
