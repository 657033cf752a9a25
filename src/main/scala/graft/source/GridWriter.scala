package graft.source

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Grid sink (SURVEY §2.1 S5, done for scale): writes a long-form grid
  * `(time, lon, lat, h, vars…)` as a **Hive-partitioned** parquet table
  *
  * {{{ dir/ts=2024-04-09T05:00:00/part-….parquet }}}
  *
  * with rows sorted by `(h, lat, lon)` *within* files.
  *
  * Why this layout at 100 TB (vs the reference's flat
  * `<prefix><ts><postfix>` filename convention, `kamodo_dask.py:63-67`):
  *   - **partition pruning is declarative**: `read.parquet(dir)
  *     .filter($"ts" between …)` prunes directories in the Catalyst
  *     optimizer — no candidate-name generation, no existence probing, no
  *     manual path lists;
  *   - **row-group skipping works**: the reference applies its h-band
  *     filter after a full read (`kamodo_dask.py:247-249`); sorting by h
  *     within files gives parquet row-group stats tight h ranges, so the
  *     pushed `h BETWEEN` predicate skips most of each file's row groups;
  *   - the partition column stays a real timestamp after read (recovered
  *     from the directory value), so provenance time needs no filename
  *     regex at all.
  */
object GridWriter {

  val PartitionCol = "ts"

  /** Write `df` (must contain `timeCol`) partitioned by formatted timestep
    * directories, sorted within partitions for row-group skipping.
    */
  def writePartitioned(
      df: DataFrame,
      dir: String,
      timeCol: String = "time",
      sortCols: Seq[String] = Seq("h", "lat", "lon"),
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    df
      .withColumn(PartitionCol,
        date_format(col(timeCol), "yyyy-MM-dd'T'HH:mm:ss"))
      .drop(timeCol)
      // one shuffle partition per timestep directory, then an in-partition
      // sort: each output file covers one timestep with h-clustered row
      // groups (maxRecordsPerFile can split further without losing order)
      .repartition(col(PartitionCol))
      .sortWithinPartitions(sortCols.map(col): _*)
      .write
      .mode(mode)
      .partitionBy(PartitionCol)
      .parquet(dir)
  }

  /** Read back a partitioned grid table with a real timestamp `time`
    * column; `filter` on `time`/`h` prunes partitions / row groups.
    */
  def readPartitioned(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .withColumn("time",
        to_timestamp(col(PartitionCol), "yyyy-MM-dd'T'HH:mm:ss"))
      .drop(PartitionCol)
}
