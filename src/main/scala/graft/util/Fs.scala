package graft.util

/** Local-filesystem helpers for the verification/fixture paths (Verify's
  * dump staging, the grid fixtures' temp dirs). Engine code never touches
  * raw files — data goes through the Spark sources/sinks.
  */
object Fs {

  /** Recursive delete; silently tolerates a missing path. */
  def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
  }
}
