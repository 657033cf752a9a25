package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: the co-located-join path for repeated big joins.
  *
  * A shuffle join pays |fact| network movement on EVERY join; bucketing
  * pays one layout write, after which any join between tables bucketed on
  * the same key into the same bucket count is planned with ZERO Exchange —
  * each task reads bucket i of both sides locally. With `sortBy` the
  * per-bucket files are also pre-sorted, so the sort-merge join skips its
  * Sort. This is the physical design for the 100 TB fact-fact case
  * (SURVEY §4): the one-off layout cost amortizes over every downstream
  * join, while broadcast handles small dims and AQE handles one-off joins.
  *
  * Spark only recognizes bucket layout through the catalog, so these are
  * saved as EXTERNAL parquet tables (explicit `path`): data lives where
  * the caller says, the in-memory/Hive catalog carries the bucket spec.
  * Scale note: ONE FILE PER BUCKET per write task matters — writing with
  * high parallelism into few buckets fragments each bucket into many
  * files and Spark then refuses the sort-elision (it cannot assume merged
  * files are sorted); repartition on the bucket key first.
  */
object Bucketed {

  /** Save `df` as external bucketed+sorted table `table` at `path`. */
  def write(df: DataFrame, table: String, key: String, buckets: Int,
      path: String): Unit = {
    df.repartition(buckets, df(key)) // one file per bucket (see class doc)
      .write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** The catalog view of a bucketed table (bucket metadata only lives
    * there — `spark.read.parquet(path)` would see plain files and
    * re-shuffle).
    */
  def table(s: SparkSession, name: String): DataFrame = s.table(name)
}
