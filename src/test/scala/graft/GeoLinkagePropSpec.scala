package graft

/** Randomized brute-force certification of the session-3 geometry
  * claims — the oracle gates prove them on the driver fixtures; these
  * sweeps prove them on adversarial inputs the fixtures cannot reach
  * (seeds pinned — deterministic replays, not flaky fuzzing):
  *
  *   - q73's candidate claim: the 3×3 neighbor-cell cover catches
  *     EVERY within-100 km pair, including across the antimeridian
  *     seam and at the ±80° latitude extremes where the longitude
  *     bound is tightest;
  *   - [[graft.queries.GeoServing]]'s window claim: the conservative
  *     cell window is a true disc superset for arbitrary off-lattice
  *     probes and radii (parity against a blocking-free scan);
  *   - dd21's pigeonhole claim: segment blocking catches every alias
  *     within Levenshtein 2, for ALL edit types — the gated fixture
  *     only deletes/substitutes; the PassJoin argument also covers
  *     INSERTIONS and boundary-straddling edit pairs, so the sweep
  *     drives those explicitly.
  */
class GeoLinkagePropSpec extends SparkSuite {

  private def haversine(lon0: Double, lat0: Double,
      lon: Double, lat: Double): Double = {
    val sLat = math.sin(math.toRadians((lat - lat0) / 2.0))
    val sLon = math.sin(math.toRadians((lon - lon0) / 2.0))
    2.0 * 6371000.0 * math.asin(math.sqrt(
      sLat * sLat +
        math.cos(math.toRadians(lat0)) * math.cos(math.toRadians(lat)) *
        (sLon * sLon)))
  }

  private def lonOf(klon: Long): Double = klon / 10.0 - 180.0
  private def latOf(klat: Long): Double = klat / 10.0 - 80.0

  test("q73 cell cover: every within-100km lattice pair lands in a " +
    "3x3 neighbor cell — seam and latitude extremes included") {
    val rnd = new scala.util.Random(73)
    // adversarial clusters: the antimeridian seam (klon wraps), the
    // latitude extremes (tightest longitude bound), both corners, plus
    // uniform filler
    val seam = Seq.fill(150)((rnd.nextInt(8) match {
      case k if k < 4 => rnd.nextInt(60).toLong
      case _ => 3540L + rnd.nextInt(60)
    }, rnd.nextInt(1600).toLong))
    val extremes = Seq.fill(150)((rnd.nextInt(3600).toLong,
      if (rnd.nextBoolean()) rnd.nextInt(40).toLong
      else 1560L + rnd.nextInt(40)))
    val corners = Seq.fill(100)(
      ((if (rnd.nextBoolean()) rnd.nextInt(40) else 3560 + rnd.nextInt(40))
        .toLong,
       (if (rnd.nextBoolean()) rnd.nextInt(40) else 1560 + rnd.nextInt(40))
        .toLong))
    val uniform = Seq.fill(300)(
      (rnd.nextInt(3600).toLong, rnd.nextInt(1600).toLong))
    val pts = (seam ++ extremes ++ corners ++ uniform).distinct
    val probes = rnd.shuffle(pts).take(120)
    var pairs = 0
    for ((pk, pm) <- probes; (qk, qm) <- pts) {
      val d = haversine(lonOf(pk), latOf(pm), lonOf(qk), latOf(qm))
      if (d <= 100000.0) {
        pairs += 1
        val (pc, pl) = (pk / 72, pm / 16)
        val (qc, ql) = (qk / 72, qm / 16)
        val covered = (-1 to 1).exists(dl => (-1 to 1).exists(dm =>
          (pc + dl + 50) % 50 == qc && pl + dm == ql))
        assert(covered, s"pair missed by the cell cover: " +
          s"probe (klon=$pk, klat=$pm) point (klon=$qk, klat=$qm) d=$d")
      }
    }
    // the sweep must actually exercise the claim (seam/extreme clusters
    // guarantee hundreds of close pairs)
    assert(pairs > 200, s"vacuous sweep: only $pairs within-radius pairs")
  }

  test("GeoServing window: served set == blocking-free scan for random " +
    "off-lattice probes and radii") {
    import graft.queries.GeoServing
    val sf = "/root/testdata/sf0.001"
    val pts = Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("event_id")).collect()
      .map(_.getLong(0))
      .map(id => (id, (id * 7919) % 3600, (id * 104729) % 1600))
    val rnd = new scala.util.Random(172)
    val probes = Seq.fill(25)((rnd.nextDouble() * 360.0 - 180.0,
      rnd.nextDouble() * 159.8 - 79.9)) ++
      // seam- and extreme-pinned probes
      Seq((-179.97, 3.3), (179.96, -2.1), (12.3, 79.2), (-45.6, -79.4),
        (0.013, 0.017))
    for ((lon0, lat0) <- probes; r <- Seq(50000.0, 300000.0, 1000000.0)) {
      val brute = pts.iterator.map { case (id, kl, km) =>
        (id, haversine(lon0, lat0, lonOf(kl), latOf(km)))
      }.filter(_._2 <= r).toSeq.sortBy { case (id, d) => (d, id) }
      val served = GeoServing.serveRadius(spark, sf, lon0, lat0, r,
        k = pts.length)
      assert(served == brute,
        s"window dropped points at probe ($lon0, $lat0) r=$r: " +
          s"served=${served.size} brute=${brute.size}")
    }
  }

  test("dd21 pigeonhole blocking catches every <=2-edit alias, " +
    "including insertions and boundary-straddling edits") {
    val segs = Seq((1, 5), (6, 5), (11, 6))
    def blocked(base: String, alias: String): Boolean =
      segs.exists { case (st, ln) =>
        val seg = base.substring(st - 1, st - 1 + ln)
        (-2 to 2).exists { d =>
          val s = st + d
          s >= 1 && s - 1 + ln <= alias.length &&
            alias.substring(s - 1, s - 1 + ln) == seg
        }
      }
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    val hex = "0123456789abcdef"
    val rnd = new scala.util.Random(21)
    def randBase = Seq.fill(16)(hex(rnd.nextInt(16))).mkString
    def applyOp(s: String, op: Int, pos: Int): String = op match {
      case 0 => // delete
        if (s.isEmpty) s
        else s.substring(0, pos % s.length) + s.substring(pos % s.length + 1)
      case 1 => // insert (hex or the out-of-alphabet 'z')
        val c = if (rnd.nextBoolean()) 'z' else hex(rnd.nextInt(16))
        s.substring(0, pos % (s.length + 1)) + c +
          s.substring(pos % (s.length + 1))
      case _ => // substitute with a DIFFERENT char
        val p = pos % s.length
        val c = if (s(p) != 'z') 'z' else '0'
        s.substring(0, p) + c + s.substring(p + 1)
    }
    // random sweep: 0, 1, or 2 ops of any type at any positions
    for (_ <- 1 to 800) {
      val base = randBase
      var alias = base
      for (_ <- 0 until rnd.nextInt(3))
        alias = applyOp(alias, rnd.nextInt(3), rnd.nextInt(18))
      assert(lev(base, alias) <= 2, "edit script exceeded tau")
      assert(blocked(base, alias),
        s"blocking missed: base=$base alias=$alias lev=${lev(base, alias)}")
    }
    // targeted sweep: every op-type pair at every boundary-straddling
    // position pair around the segment seams (1-indexed seams after
    // positions 5 and 10) and the string ends
    val hot = Seq(0, 4, 5, 6, 9, 10, 11, 15)
    for (o1 <- 0 to 2; o2 <- 0 to 2; p1 <- hot; p2 <- hot) {
      val base = randBase
      val alias = applyOp(applyOp(base, o1, p1), o2, p2)
      assert(lev(base, alias) <= 2, "edit script exceeded tau")
      assert(blocked(base, alias),
        s"blocking missed boundary case: base=$base alias=$alias " +
          s"ops=($o1@$p1, $o2@$p2)")
    }
  }
}
