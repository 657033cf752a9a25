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

}
