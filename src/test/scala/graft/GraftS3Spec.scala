package graft

import graft.source.GraftS3

/** E1 boundary-config mapping (dask_config.py:47-86 → fs.s3a.*). */
class GraftS3Spec extends SparkSuite {

  test("maps pool size, retries, and env credentials to fs.s3a keys") {
    val env = Map("ACCESS_KEY" -> "AK", "SECRET_KEY" -> "SK")
    val s = GraftS3.s3aSettings(env)
    assert(s("fs.s3a.connection.maximum") == "50") // reference default pool
    assert(s("fs.s3a.attempts.maximum") == "10")   // 10 retry attempts
    assert(s("fs.s3a.retry.limit") == "10")
    assert(s("fs.s3a.access.key") == "AK")
    assert(s("fs.s3a.secret.key") == "SK")
  }

  test("pool size is MAX_POOL_CONNECTIONS-overridable; creds optional") {
    val s = GraftS3.s3aSettings(Map("MAX_POOL_CONNECTIONS" -> "128"))
    assert(s("fs.s3a.connection.maximum") == "128")
    // no env creds → fall back to s3a's default provider chain: the cred
    // keys must be absent, not empty strings (an empty key would override
    // instance-profile auth with a broken credential)
    assert(!s.contains("fs.s3a.access.key") && !s.contains("fs.s3a.secret.key"))
  }

  test("configure applies the keys to the live Hadoop configuration") {
    val applied =
      GraftS3.configure(spark, Map("MAX_POOL_CONNECTIONS" -> "77",
        "ACCESS_KEY" -> "AK", "SECRET_KEY" -> "SK"))
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.connection.maximum") == "77")
    assert(applied.forall(k => hc.get(k) != null))
    // the return value is loggable: key names only, no credential values
    assert(applied.forall(v => !v.contains("AK") && !v.contains("SK")))
  }
  test("Retry: exact backoff sequence, suppressed history, fail-fast on non-IO") {
    import graft.source.Retry
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    var calls = 0
    // 3 transient failures then success, attempts 10: four calls, the
    // boto3-standard doubling backoff after each failure
    val got = Retry.withRetries(10, baseMs = 100, sleep = sleeps += _) {
      calls += 1
      if (calls <= 3) throw new java.io.IOException(s"flaky $calls")
      42
    }
    assert(got == 42 && calls == 4)
    assert(sleeps.toSeq == Seq(100L, 200L, 400L))
    // attempts exhausted: the LAST failure surfaces, the earlier ones
    // ride as suppressed — the full flake history is in one stack trace
    sleeps.clear(); calls = 0
    val e = intercept[java.io.IOException] {
      Retry.withRetries(3, baseMs = 1, sleep = sleeps += _) {
        calls += 1; throw new java.io.IOException(s"flaky $calls")
      }
    }
    assert(calls == 3 && e.getMessage == "flaky 3")
    assert(e.getSuppressed.map(_.getMessage).toSeq == Seq("flaky 1", "flaky 2"))
    assert(sleeps.toSeq == Seq(1L, 2L))
    // backoff is CAPPED at 20s (boto3 standard's MAX_BACKOFF): a large
    // configured attempt budget must not shift into negative sleeps or
    // multi-year waits
    sleeps.clear(); calls = 0
    intercept[java.io.IOException] {
      Retry.withRetries(65, baseMs = 100, sleep = sleeps += _) {
        calls += 1; throw new java.io.IOException("flaky")
      }
    }
    assert(calls == 65)
    assert(sleeps.forall(s => s > 0 && s <= 20000L),
      s"backoff left the cap envelope: ${sleeps.filterNot(s => s > 0 && s <= 20000L).take(3)}")
    assert(sleeps.count(_ == 20000L) >= 50, "cap never engaged")
    // non-IO failures are bugs, not transience: exactly one call
    calls = 0
    intercept[IllegalArgumentException] {
      Retry.withRetries(10, sleep = _ => ()) {
        calls += 1; throw new IllegalArgumentException("bad path")
      }
    }
    assert(calls == 1)
    // definitive store answers are NOT transient even though they are
    // IOExceptions: a vanished path (404-shaped) or a permission denial
    // (403-shaped) fails fast instead of burning the full backoff budget
    // — boto3 standard mode's behavior
    calls = 0
    intercept[java.io.FileNotFoundException] {
      Retry.withRetries(10, sleep = _ => ()) {
        calls += 1; throw new java.io.FileNotFoundException("gone")
      }
    }
    assert(calls == 1, "FileNotFoundException must fail fast, not retry")
    calls = 0
    intercept[org.apache.hadoop.security.AccessControlException] {
      Retry.withRetries(10, sleep = _ => ()) {
        calls += 1
        throw new org.apache.hadoop.security.AccessControlException("denied")
      }
    }
    assert(calls == 1, "AccessControlException must fail fast, not retry")
  }

  test("discovery through grafts3:// survives injected transient listing failures") {
    import graft.source.{GraftTestFs => TF}
    import graft.source.GridCatalog
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.grafts3.impl", classOf[graft.source.GraftTestFs].getName)
    // fixture: two timestamped files under a local dir, served via the
    // grafts3 scheme (authority = bucket, path = local path)
    val dir = java.nio.file.Files.createTempDirectory("retry-fx").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(
      s"$dir/grid_2024-01-02T00:10:00.parquet"), Array[Byte](1))
    java.nio.file.Files.write(java.nio.file.Paths.get(
      s"$dir/grid_2024-01-02T00:20:00.parquet"), Array[Byte](1))
    val uri = s"grafts3://bucket$dir"
    val prevAttempts = hc.get("fs.s3a.attempts.maximum")
    try {
      // 2 injected failures, 10 attempts (the GraftS3 default): the
      // listing succeeds on the 3rd try and discovery sees both steps
      hc.set("fs.s3a.attempts.maximum", "10")
      TF.failNextListings.set(2); TF.listings.set(0)
      val found = GridCatalog.discover(spark, uri, prefix = "grid_")
      assert(found.size == 2, s"discovered ${found.size} of 2")
      assert(TF.listings.get == 3,
        s"expected 3 listing attempts (2 failed + 1 ok), saw ${TF.listings.get}")
      // failures outlasting the budget: the envelope gives up after
      // exactly `attempts` tries and the transient error surfaces
      hc.set("fs.s3a.attempts.maximum", "3")
      TF.failNextListings.set(99); TF.listings.set(0)
      intercept[java.io.IOException] {
        GridCatalog.discover(spark, uri, prefix = "grid_")
      }
      assert(TF.listings.get == 3,
        s"expected exactly 3 attempts, saw ${TF.listings.get}")
    } finally {
      TF.failNextListings.set(0)
      if (prevAttempts == null) hc.unset("fs.s3a.attempts.maximum")
      else hc.set("fs.s3a.attempts.maximum", prevAttempts)
      graft.util.Fs.rmTree(new java.io.File(dir))
    }
  }

  test("paged listings: complete across pages; a continuation-token " +
    "failure re-lists from scratch, never a truncated result") {
    import graft.source.{GraftTestFs => TF}
    import graft.source.GridCatalog
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.grafts3.impl", classOf[graft.source.GraftTestFs].getName)
    val dir = java.nio.file.Files.createTempDirectory("page-fx").toString
    // 5 cadence steps, page size 2 → a 3-page listing (the s3a shape for
    // >1000-key prefixes, scaled down)
    val stamps = (1 to 5).map(i => f"2024-01-02T00:${i}0:00")
    stamps.foreach { ts =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/grid_$ts.parquet"), Array[Byte](1))
    }
    val uri = s"grafts3://bucket$dir"
    try {
      TF.pageSize.set(2); TF.pageFetches.set(0); TF.listings.set(0)
      val found = GridCatalog.discover(spark, uri, prefix = "grid_")
      assert(found.map(f => GridCatalog.formatTs(f.ts)) == stamps,
        s"paged listing lost or reordered entries: ${found.map(_.path)}")
      assert(TF.pageFetches.get == 3,
        s"expected 3 page fetches for 5 keys @ 2/page, saw ${TF.pageFetches.get}")
      // mid-pagination failure (page 2 of 3): the WHOLE listing fails and
      // the Retry envelope re-lists from page 1 — discovery still returns
      // the complete set, and the fetch count shows 2 (failed attempt)
      // + 3 (clean attempt) pages, not a resumed partial walk
      TF.pageFetches.set(0); TF.listings.set(0); TF.failAtPage.set(2)
      val found2 = GridCatalog.discover(spark, uri, prefix = "grid_")
      assert(found2.map(f => GridCatalog.formatTs(f.ts)) == stamps,
        "a mid-pagination failure surfaced as a truncated discovery")
      assert(TF.listings.get == 2,
        s"expected 2 listing attempts (1 failed mid-page + 1 ok), saw ${TF.listings.get}")
      assert(TF.pageFetches.get == 5,
        s"expected 2 + 3 page fetches across the retry, saw ${TF.pageFetches.get}")
    } finally {
      TF.pageSize.set(0); TF.failAtPage.set(0)
      graft.util.Fs.rmTree(new java.io.File(dir))
    }
  }

  test("listing-after-write lag: a fresh file is invisible until the " +
    "store index catches up; the next discovery converges") {
    import graft.source.{GraftTestFs => TF}
    import graft.source.GridCatalog
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.grafts3.impl", classOf[graft.source.GraftTestFs].getName)
    val dir = java.nio.file.Files.createTempDirectory("lag-fx").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(
      s"$dir/grid_2024-01-02T00:10:00.parquet"), Array[Byte](1))
    java.nio.file.Files.write(java.nio.file.Paths.get(
      s"$dir/grid_2024-01-02T00:20:00.parquet"), Array[Byte](1))
    val uri = s"grafts3://bucket$dir"
    try {
      assert(GridCatalog.discover(spark, uri, prefix = "grid_").size == 2)
      // a new cadence step lands, but the store's list index lags one
      // listing behind the PUT (S3's delayed ListObjects visibility)
      val fresh = "grid_2024-01-02T00:30:00.parquet"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/$fresh"), Array[Byte](1))
      TF.hiddenNames.add(fresh); TF.hideForListings.set(1)
      // discovery is a SNAPSHOT of what the store lists: it returns the
      // two visible steps (correct, not an error) — the new file is not
      // half-visible or erroring, it is simply not yet listed
      val lagged = GridCatalog.discover(spark, uri, prefix = "grid_")
      assert(lagged.size == 2,
        s"lagged listing should see 2 files, saw ${lagged.map(_.path)}")
      // the next poll (GridStream's per-trigger re-discovery is exactly
      // this call) sees the index converge and picks the new step up —
      // eventual consistency handled by re-listing, not by state
      val converged = GridCatalog.discover(spark, uri, prefix = "grid_")
      assert(converged.size == 3 &&
        converged.map(f => GridCatalog.formatTs(f.ts)).last ==
          "2024-01-02T00:30:00",
        s"post-lag discovery should converge to 3 files: ${converged.map(_.path)}")
    } finally {
      TF.hideForListings.set(0); TF.hiddenNames.clear()
      graft.util.Fs.rmTree(new java.io.File(dir))
    }
  }

}
