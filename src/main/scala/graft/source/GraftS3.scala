package graft.source

import org.apache.spark.sql.SparkSession

/** S3 boundary configuration (SURVEY §2.1 / E1): the Spark counterpart of
  * the reference's boto3/s3fs client setup
  * (`kamodo_dask/dask_config.py:47-86`):
  *
  *   - connection-pool size 50, overridable via `MAX_POOL_CONNECTIONS`
  *     (`dask_config.py:5,48,74,85`) → `fs.s3a.connection.maximum`;
  *   - 10 retry attempts, standard mode (`dask_config.py:49-52`) →
  *     `fs.s3a.attempts.maximum` + `fs.s3a.retry.limit` (s3a's built-in
  *     exponential-backoff retry policy is the "standard" analog);
  *   - credentials from the `ACCESS_KEY` / `SECRET_KEY` environment
  *     (`dask_config.py:56-59,81-82`) → `fs.s3a.access.key` /
  *     `fs.s3a.secret.key`, falling back to s3a's default provider chain
  *     (instance profiles, AWS_* env) when unset — strictly more capable
  *     than the reference, which requires the env vars.
  *
  * Set on the SparkContext's live Hadoop configuration so it applies to
  * FileSystem instances created after the call (a cluster deployment would
  * put the same keys in spark-defaults as `spark.hadoop.fs.s3a.*`).
  */
object GraftS3 {

  /** The `fs.s3a.*` keys [[configure]] sets for a given environment. */
  def s3aSettings(env: Map[String, String]): Map[String, String] = {
    val pool = env.getOrElse("MAX_POOL_CONNECTIONS", "50")
    val creds = for {
      key <- env.get("ACCESS_KEY")
      secret <- env.get("SECRET_KEY")
    } yield Map(
      "fs.s3a.access.key" -> key,
      "fs.s3a.secret.key" -> secret)
    Map(
      "fs.s3a.connection.maximum" -> pool,
      "fs.s3a.attempts.maximum" -> "10",
      "fs.s3a.retry.limit" -> "10") ++ creds.getOrElse(Map.empty)
  }

  /** Apply the reference's S3 tuning to this session. Returns only the
    * applied key NAMES (safe for logging) — never the values, which may
    * include `fs.s3a.secret.key`.
    */
  def configure(spark: SparkSession,
      env: Map[String, String] = sys.env): Set[String] = {
    val settings = s3aSettings(env)
    val hc = spark.sparkContext.hadoopConfiguration
    settings.foreach { case (k, v) => hc.set(k, v) }
    settings.keySet
  }
}
