package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.interp.JoinInterpolator

/** The core grid-engine operator under the oracle gate: join-mode
  * multilinear interpolation (SURVEY §2.8 tier 3) exercised end-to-end on
  * driver data. The events table bucketed to a 10-minute cadence is a
  * 1-D regular grid — exactly the reference's time axis — and ten probe
  * points are interpolated through the full corner-join machinery
  * (locate → corner explode → equi-join on plane index → weighted agg).
  * DuckDB replays the same linear interpolation with bracketing-plane
  * subqueries, so the operator's arithmetic is hash-checked, not just
  * spec-checked. (The 4-D path is covered by GridEngineSpec against the
  * analytic fixture field.)
  */
object GridQueries {

  private val fracs: Seq[(Int, Double)] =
    (0 until 10).map(i => i -> (0.05 + 0.1 * i))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g1_interp_1d" -> ((s, dir) => {
      import s.implicits._
      // 10-min bucketed series = dense 1-D grid (t in epoch seconds)
      val series = Tables.events(s, dir)
        .groupBy((floor(unix_timestamp(col("ts")) / 600) * 600)
          .cast("double").as("t"))
        .agg(avg("value").as("v"))
        .persist()
      val axis = series.select("t").orderBy("t").collect().map(_.getDouble(0))
      val (tMin, tMax) = (axis.head, axis.last)
      val probes = fracs.map { case (i, f) =>
        (i.toLong, tMin + f * (tMax - tMin))
      }.toDF("id", "t")
      JoinInterpolator.interpolate(
        probes, "id", series, Array(axis), valueCols = Seq("v"),
        coordCols = Seq("t"))
    }),

    // Same probes through tier 2 (broadcast grid + UDF) — identical
    // semantics, so it shares g1's oracle arithmetic. Exercises
    // RegularGrid + BroadcastInterpolator under the hash gate.
    "g2_interp_broadcast" -> ((s, dir) => {
      import s.implicits._
      val series = Tables.events(s, dir)
        .groupBy((floor(unix_timestamp(col("ts")) / 600) * 600)
          .cast("double").as("t"))
        .agg(avg("value").as("v"))
      val rows = series.orderBy("t").collect()
      val axis = rows.map(_.getDouble(0))
      val grid = new graft.model.RegularGrid(
        Array(axis), rows.map(_.getDouble(1)))
      val bi = graft.interp.BroadcastInterpolator(s, grid)
      val (tMin, tMax) = (axis.head, axis.last)
      fracs.map { case (i, f) => (i.toLong, tMin + f * (tMax - tMin)) }
        .toDF("id", "t")
        .select(col("id"), bi.applySeq(Seq(col("t"))).as("v"))
    })
  )

  private val fracsSql =
    fracs.map { case (i, f) => s"($i, $f)" }.mkString(", ")

  private val interpOracle: String =
      s"""WITH series AS (
         |  SELECT CAST(floor(epoch(ts) / 600) * 600 AS DOUBLE) AS t,
         |         avg(value) AS v
         |  FROM events GROUP BY 1),
         |hull AS (SELECT min(t) AS tmin, max(t) AS tmax FROM series),
         |fr(id, f) AS (VALUES $fracsSql),
         |probes AS (SELECT id, tmin + f * (tmax - tmin) AS t FROM fr, hull),
         |br AS (
         |  SELECT p.id, p.t,
         |    (SELECT max(s.t) FROM series s WHERE s.t <= p.t) AS t1,
         |    (SELECT min(s.t) FROM series s WHERE s.t > p.t) AS t2
         |  FROM probes p)
         |SELECT b.id,
         |  (1 - (b.t - b.t1) / (b.t2 - b.t1)) * s1.v
         |    + ((b.t - b.t1) / (b.t2 - b.t1)) * s2.v AS v
         |FROM br b
         |JOIN series s1 ON s1.t = b.t1
         |JOIN series s2 ON s2.t = b.t2""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "g1_interp_1d" -> interpOracle,
    // tiers 2 and 3 implement identical semantics → identical oracle
    "g2_interp_broadcast" -> interpOracle
  )
}
