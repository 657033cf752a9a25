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
}
