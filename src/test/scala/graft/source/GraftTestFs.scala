package graft.source

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Test-scheme Hadoop FileSystem (`grafts3://`) — a local stand-in for an
  * S3-compatible store, so [[GraftS3]]'s `fs.s3a.*` mapping can be
  * exercised by a REAL read path instead of only asserted into the conf
  * (the reference's equivalent integration surface is
  * `test/test_parquet_prod.py:1-46`, which hits a live bucket — no
  * network exists in this environment, so the stand-in proves the same
  * wiring: session conf → FileSystem instance → bytes).
  *
  * Mechanics: extends RawLocalFileSystem, so `grafts3://bucket/abs/path`
  * serves the local file at `/abs/path` (the authority plays the bucket
  * role and is ignored for data placement, like a path-style S3 URL).
  * `initialize` — the exact hook where s3a constructs its client from
  * `fs.s3a.*` — snapshots those keys from the live Configuration, and
  * `open` counts data reads, so a spec can assert that the values
  * [[GraftS3.configure]] set were consumed by the instance that served
  * the bytes. Test-only: lives in test sources, never on the library
  * classpath.
  */
object GraftTestFs {
  /** fs.s3a.* keys as seen by the last `initialize` — the proof object. */
  @volatile var seenS3aConf: Map[String, String] = Map.empty
  val opens = new AtomicInteger(0)
  val creates = new AtomicInteger(0)
  /** Transient-failure injection: while > 0, each listStatus throws an
    * IOException (and decrements) — simulates the flaky object-store
    * listing the Retry envelope exists for. `listings` counts ALL
    * listStatus calls including the failed ones.
    */
  val failNextListings = new AtomicInteger(0)
  val listings = new AtomicInteger(0)
  /** Paged-listing simulation (S3 ListObjectsV2 returns ≤1000 keys per
    * page behind continuation tokens; s3a assembles the pages inside one
    * listStatus): when > 0, each listStatus serves its result through
    * ceil(n/pageSize) internal page fetches, counted in [[pageFetches]].
    * A positive [[failAtPage]] k injects ONE IOException while fetching
    * page k (then clears) — the mid-pagination continuation-token
    * failure mode. Key contract being proven: a partial page set NEVER
    * escapes as a truncated listing; the whole listStatus fails and the
    * caller's Retry envelope re-lists from scratch.
    */
  val pageSize = new AtomicInteger(0)
  val pageFetches = new AtomicInteger(0)
  val failAtPage = new AtomicInteger(0)
  /** Listing-after-write lag (S3's delayed index visibility: a PUT can
    * be readable by key before it appears in ListObjects): file NAMES in
    * [[hiddenNames]] are invisible to listStatus while
    * [[hideForListings]] > 0; each listing decrements the counter, so
    * the store "catches up" after that many listings and the names
    * reappear.
    */
  val hideForListings = new AtomicInteger(0)
  val hiddenNames: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  val S3aKeys: Seq[String] = Seq(
    "fs.s3a.connection.maximum", "fs.s3a.attempts.maximum",
    "fs.s3a.retry.limit", "fs.s3a.access.key", "fs.s3a.secret.key")
}

class GraftTestFs extends RawLocalFileSystem {
  private var myUri: URI = _

  override def getScheme: String = "grafts3"
  // the superclass CONSTRUCTOR calls getUri (via
  // getInitialWorkingDirectory) before this class's field initializers
  // run — fall back until initialize() pins the real authority
  override def getUri: URI =
    if (myUri == null) URI.create("grafts3:///") else myUri

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    myUri = URI.create(
      name.getScheme + "://" + Option(name.getAuthority).getOrElse(""))
    GraftTestFs.seenS3aConf = GraftTestFs.S3aKeys
      .flatMap(k => Option(conf.get(k)).map(k -> _)).toMap
  }

  override def open(f: Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    GraftTestFs.opens.incrementAndGet()
    super.open(f, bufferSize)
  }

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    GraftTestFs.listings.incrementAndGet()
    if (GraftTestFs.failNextListings.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new java.io.IOException(
        "grafts3: injected transient listing failure")
    var all = super.listStatus(f)
    // delayed index visibility: recently-PUT names missing from the list
    if (GraftTestFs.hideForListings.getAndUpdate(n => math.max(0, n - 1)) > 0)
      all = all.filterNot(st => GraftTestFs.hiddenNames.contains(
        st.getPath.getName))
    // paged assembly: all pages must fetch for the listing to return —
    // a continuation-token failure fails the WHOLE call (no partial
    // array escapes), which is exactly what s3a's paged listing does
    val ps = GraftTestFs.pageSize.get()
    if (ps > 0) {
      val nPages = math.max(1, (all.length + ps - 1) / ps)
      var page = 1
      while (page <= nPages) {
        GraftTestFs.pageFetches.incrementAndGet()
        if (GraftTestFs.failAtPage.get() == page) {
          GraftTestFs.failAtPage.set(0)
          throw new java.io.IOException(
            s"grafts3: injected continuation-token failure on page $page")
        }
        page += 1
      }
    }
    all
  }

  // every create overload in RawLocalFileSystem funnels through this
  // hook (the public create(...) variants do not all call each other)
  override protected def createOutputStreamWithMode(f: Path,
      append: Boolean,
      permission: org.apache.hadoop.fs.permission.FsPermission)
      : java.io.OutputStream = {
    GraftTestFs.creates.incrementAndGet()
    super.createOutputStreamWithMode(f, append, permission)
  }
}
