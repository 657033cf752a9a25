package graft.source

import java.io.IOException

import org.apache.hadoop.conf.Configuration

/** Client-call retry envelope — the engine-side form of the reference's
  * boto3 "standard" retry config (`kamodo_dask/dask_config.py:49-52`:
  * `max_attempts 10, mode standard`). The parquet DATA path already
  * retries inside the s3a client (GraftS3 maps the same knobs onto
  * `fs.s3a.attempts.maximum` / `fs.s3a.retry.limit`), but the catalog's
  * own driver-side store calls — the discovery listing — run OUTSIDE any
  * s3a client when the store is a different FileSystem, so they carry
  * their own envelope here.
  *
  * Semantics, kept deliberately boto3-standard-shaped:
  *   - `attempts` TOTAL tries (first call included), read from the SAME
  *     `fs.s3a.attempts.maximum` key GraftS3 sets, so one knob governs
  *     both layers;
  *   - full-jitter-free exponential backoff: base · 2ᵏ after the k-th
  *     failure (deterministic — reproducible tests beat jitter in a
  *     single-driver listing; at fleet scale add jitter);
  *   - retries IOException only: transient-transport-shaped failures.
  *     Everything else (parse errors, permission/path bugs) propagates
  *     immediately — retrying those only delays the real error.
  *
  * The `sleep` hook exists for tests (RetrySpec pins the exact backoff
  * sequence without sleeping through it).
  */
object Retry {

  /** The conf key shared with [[GraftS3.s3aSettings]]. */
  val AttemptsKey = "fs.s3a.attempts.maximum"

  /** Backoff base in ms; small — a driver listing retry loop should
    * resolve in seconds, matching the reference's standard mode.
    */
  val BaseBackoffMs = 100L

  def attemptsFrom(conf: Configuration): Int =
    math.max(1, conf.getInt(AttemptsKey, 10))

  /** Transient-transport-shaped failures only. Two IOException
    * SUBCLASSES are explicitly non-retriable because they encode a
    * definitive store answer, not a flake — boto3 "standard" mode
    * likewise does not retry 404/403-shaped errors:
    *   - [[java.io.FileNotFoundException]]: a path that vanished between
    *     the retried `exists()` and `listStatus()` is gone; burning the
    *     full backoff budget (~50 s of sleeps at defaults) only delays
    *     the real error;
    *   - `AccessControlException`: a permission denial is configuration,
    *     never transient.
    */
  def isRetriable(t: Throwable): Boolean = t match {
    case _: java.io.FileNotFoundException => false
    case _: org.apache.hadoop.security.AccessControlException => false
    case _: IOException => true
    case _ => false
  }

  /** Run `body`, retrying retriable failures up to `attempts` total
    * tries with exponential backoff. The LAST failure is rethrown
    * verbatim (earlier ones ride as suppressed, so a flaky-then-fatal
    * sequence is fully visible in the stack trace).
    */
  def withRetries[A](attempts: Int, baseMs: Long = BaseBackoffMs,
      sleep: Long => Unit = Thread.sleep)(body: => A): A = {
    require(attempts >= 1, s"attempts $attempts must be >= 1")
    var prior: List[Throwable] = Nil
    var k = 0
    while (true) {
      try {
        return body
      } catch {
        case t: Throwable if isRetriable(t) && k < attempts - 1 =>
          prior = t :: prior
          // cap at ~20 s (boto3 standard's MAX_BACKOFF): an unbounded
          // shift overflows negative past k=57 (Thread.sleep throws) and
          // is a multi-year sleep long before that
          sleep(math.min(baseMs << math.min(k, 30), 20000L))
          k += 1
        case t: Throwable =>
          prior.reverse.foreach(t.addSuppressed) // chronological order
          throw t
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
