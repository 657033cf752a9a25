package graft

import java.nio.file.{Files, Paths}

import graft.util.Fs

/** The scheme-agnostic staging helpers (`Fs.mkStagingDir/rename/rmTree`)
  * through an EXPLICIT `file:`-scheme Hadoop FileSystem — the same code
  * path an `s3a://` staging root would take — plus the local rmTree's
  * symlink-safety contract.
  */
class FsSpec extends SparkSuite {

  test("staging dir + rename + rmTree run through a file:-scheme Hadoop FS") {
    val root = Files.createTempDirectory("graft_fs_spec_").toString
    spark.conf.set("graft.staging.dir", "file:" + root)
    try {
      val dir = Fs.mkStagingDir(spark, "probe_")
      assert(dir.startsWith("file:"), s"staging dir not scheme'd: $dir")
      val local = Paths.get(dir.stripPrefix("file:"))
      assert(Files.isDirectory(local), s"staging dir not created: $dir")
      // the g5 flow renames a staged partition dir to a colon-bearing
      // plane name (the reference's timestep format) — the exact case
      // Hadoop's Globber cannot parse, so the rename must go through
      // Path-from-full-string, never a glob or a relative child Path
      val src = s"$dir/t_s=600"
      Fs.hadoopFs(spark, src)
        .mkdirs(new org.apache.hadoop.fs.Path(src))
      val dst = s"$dir/data_2018-01-01T00:00:00.parquet"
      Fs.rename(spark, src, dst)
      assert(Files.isDirectory(
        Paths.get(dst.stripPrefix("file:"))), "colon-named rename target missing")
      // rename of a missing source fails loudly, not silently (the local
      // FS throws FileNotFoundException itself; stores that return false
      // instead hit Fs.rename's own require)
      intercept[Exception] {
        Fs.rename(spark, s"$dir/nope", s"$dir/nope2")
      }
      Fs.rmTree(spark, dir)
      assert(!Files.exists(local), "rmTree left the staging dir behind")
      Fs.rmTree(spark, dir) // missing path tolerated
    } finally {
      spark.conf.unset("graft.staging.dir")
      Fs.rmTree(new java.io.File(root))
    }
  }

  test("g5's staging flow runs end-to-end under an explicit file: root") {
    // the full write → rename-to-colon-named-planes → list → prune →
    // fetch → interpolate flow, with every staging step resolved through
    // the Hadoop FileSystem of the configured scheme — what an s3a://
    // root would exercise
    val root = Files.createTempDirectory("graft_fs_g5_").toString
    spark.conf.set("graft.staging.dir", "file:" + root)
    try {
      val out = SparkEntry.queries("g5_e2e_fetch")(
        spark, "/root/testdata/sf0.001")
      assert(out.count() > 0)
      val leftovers = Paths.get(root).toFile.listFiles()
        .map(_.getName).filter(_.startsWith("graft_g5_stage_"))
      assert(leftovers.isEmpty,
        s"staging dirs not cleaned: ${leftovers.mkString(",")}")
    } finally {
      spark.conf.unset("graft.staging.dir")
    }
  }

  test("default staging root is the local tmpdir as file:") {
    val dir = Fs.mkStagingDir(spark, "probe_default_")
    try {
      assert(dir.startsWith("file:" + System.getProperty("java.io.tmpdir")))
    } finally Fs.rmTree(spark, dir)
  }

  test("local rmTree deletes a planted dir-symlink without following it") {
    val outside = Files.createTempDirectory("graft_fs_outside_")
    val victim = outside.resolve("victim.txt")
    Files.write(victim, "keep me".getBytes)
    val tree = Files.createTempDirectory("graft_fs_tree_")
    Files.write(tree.resolve("a.txt"), "x".getBytes)
    val sub = Files.createDirectory(tree.resolve("sub"))
    Files.write(sub.resolve("b.txt"), "y".getBytes)
    Files.createSymbolicLink(tree.resolve("planted"), outside)
    try {
      Fs.rmTree(tree.toFile)
      assert(!Files.exists(tree), "tree not fully removed")
      assert(Files.exists(victim),
        "rmTree followed the symlink and deleted outside the tree")
    } finally {
      Fs.rmTree(outside.toFile)
    }
  }
}
