package graft.source

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic reference-shaped grid fixtures (FIXTURES.md §A): one
  * parquet "file" (directory) per 10-minute timestep, timestamp in the name
  * (`kamodo_dask/kamodo_dask.py:63-67` layout), each holding the full dense
  * cartesian `(lon, lat, h)` grid with unit-suffixed variable columns.
  *
  * Values follow an analytic **multilinear** field, so any correct
  * multilinear interpolator must reproduce them exactly — the property-test
  * oracle. The reference has no local fixtures at all (its tests hit a live
  * bucket); these stand in for that bucket.
  */
object GridFixtures {

  val lonAxis: Array[Double] = (0 to 18).map(_ * 20.0).toArray       // 0..360
  val latAxis: Array[Double] = (-4 to 4).map(_ * 20.0).toArray       // -80..80
  val hAxis: Array[Double] = (0 to 12).map(250000.0 + _ * 12500.0).toArray

  val t0: Instant = Instant.parse("2024-04-09T05:00:00Z")

  /** analytic multilinear fields; t in epoch seconds */
  def rho(t: Double, lon: Double, lat: Double, h: Double): Double =
    1.0e-9 + 1.0e-15 * t + 2.0e-12 * lon - 3.0e-12 * lat - 1.0e-15 * h

  def temperature(t: Double, lon: Double, lat: Double, h: Double): Double =
    180.0 + 1.0e-6 * t + 0.05 * lon + 0.1 * lat + 1.0e-4 * h

  /** Rows for one timestep: full cartesian grid. */
  private def timestepDf(spark: SparkSession, ts: Instant): DataFrame = {
    import spark.implicits._
    val t = ts.getEpochSecond.toDouble
    val rows = for (lo <- lonAxis; la <- latAxis; h <- hAxis)
      yield (lo, la, h, rho(t, lo, la, h), temperature(t, lo, la, h))
    rows.toSeq.toDF("lon", "lat", "h", "rho[kg/m^3]", "T[K]")
  }

  /** Write `n` consecutive 10-minute timesteps under `dir`, optionally
    * skipping some (hole-in-cadence variant, `kamodo_dask.py:72-86`
    * tolerates missing files). Idempotent per timestep.
    */
  def write(spark: SparkSession, dir: String, n: Int = 13,
      skip: Set[Int] = Set.empty, injectNaN: Boolean = false): Seq[Instant] = {
    val written = (0 until n).filterNot(skip).map { i =>
      val ts = t0.plusSeconds(600L * i)
      var df = timestepDf(spark, ts)
      if (injectNaN && i == 0)
        df = df.withColumn("rho[kg/m^3]",
          when(col("lon") === 0.0 && col("lat") === -80.0 && col("h") === 250000.0,
            lit(Double.NaN)).otherwise(col("rho[kg/m^3]")))
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$dir/${GridCatalog.formatTs(ts)}.parquet")
      ts
    }
    written
  }

  /** Fixture dir under the build's target/ (inside the repo, regenerated on
    * demand); keyed by variant so suites don't clobber each other.
    */
  def ensure(spark: SparkSession, variant: String, n: Int = 13,
      skip: Set[Int] = Set.empty, injectNaN: Boolean = false): String = {
    val dir = s"target/grid-fixtures/$variant"
    val marker = new java.io.File(s"$dir/_DONE")
    if (!marker.exists()) {
      write(spark, dir, n, skip, injectNaN)
      marker.getParentFile.mkdirs()
      marker.createNewFile()
    }
    dir
  }
}
