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
    }),

    // 4-D multilinear interpolation under the hash gate — the reference's
    // one true operator at its real arity (kamodo_dask.py:325-338 builds a
    // 4-D (time, lon, lat, h) RegularGridInterpolator; construction
    // :335-338). Grid = events bucketed over four derived axes (6-day time
    // bucket × user band × event parity × type-length parity — 6×3×2×2 =
    // 72 cells, dense at every driver SF), probes at interior points, so
    // the full 2^4 = 16-corner expansion, the 4-int equi-join, and the
    // product-weight aggregation are all hash-checked against a 16-corner
    // DuckDB oracle (generalizing g3's bracketing-plane SQL).
    "g4_interp_4d" -> ((s, dir) => {
      import s.implicits._
      val series = Tables.events(s, dir)
        .groupBy(
          (floor(unix_timestamp(col("ts")) / 518400) * 518400)
            .cast("double").as("t"),
          (col("user_id") % 3).cast("double").as("u"),
          (col("event_id") % 2).cast("double").as("p"),
          (length(col("event_type")) % 2).cast("double").as("q"))
        .agg(avg("value").as("v"))
        .persist()
      def axis(c: String): Array[Double] =
        series.select(c).distinct().orderBy(c).collect().map(_.getDouble(0))
      val (tA, uA, pA, qA) = (axis("t"), axis("u"), axis("p"), axis("q"))
      val probes = fracs.map { case (i, f) =>
        (i.toLong,
          tA.head + f * (tA.last - tA.head),
          uA.head + (1.0 - f) * (uA.last - uA.head),
          pA.head + f * (pA.last - pA.head),
          qA.head + (1.0 - f) * (qA.last - qA.head))
      }.toDF("id", "t", "u", "p", "q")
      JoinInterpolator.interpolate(
        probes, "id", series, Array(tA, uA, pA, qA), valueCols = Seq("v"),
        coordCols = Seq("t", "u", "p", "q"))
    }),

    // 2-D bilinear through the same corner-join machinery: grid over
    // (6-day time bucket × user band), probes at interior points — the
    // multi-axis corner expansion (2^d = 4 live corners) under the gate.
    "g3_interp_2d" -> ((s, dir) => {
      import s.implicits._
      val series = Tables.events(s, dir)
        .groupBy(
          (floor(unix_timestamp(col("ts")) / 518400) * 518400)
            .cast("double").as("t"),
          (col("user_id") % 4).cast("double").as("u"))
        .agg(avg("value").as("v"))
        .persist()
      val tAxis = series.select("t").distinct().orderBy("t")
        .collect().map(_.getDouble(0))
      val uAxis = series.select("u").distinct().orderBy("u")
        .collect().map(_.getDouble(0))
      val probes = fracs.map { case (i, f) =>
        (i.toLong,
          tAxis.head + f * (tAxis.last - tAxis.head),
          uAxis.head + (1.0 - f) * (uAxis.last - uAxis.head))
      }.toDF("id", "t", "u")
      JoinInterpolator.interpolate(
        probes, "id", series, Array(tAxis, uAxis), valueCols = Seq("v"),
        coordCols = Seq("t", "u"))
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

  /** 16-corner quadrilinear oracle: per-axis bracketing planes, product
    * weights in the same left-to-right factor order the Spark side's
    * `reduce(_ * _)` multiplies, one series join per corner. Generated so
    * the 16 corner terms stay mechanically consistent.
    */
  private val g4Oracle: String = {
    val axes = Seq("t", "u", "p", "q")
    val corners = for {
      ct <- 0 to 1; cu <- 0 to 1; cp <- 0 to 1; cq <- 0 to 1
    } yield {
      val bits = Seq(ct, cu, cp, cq)
      val al = "s" + bits.mkString
      val weight = axes.zip(bits).map { case (ax, bit) =>
        if (bit == 1) s"f$ax" else s"(1 - f$ax)"
      }.mkString(" * ")
      val on = axes.zip(bits).map { case (ax, bit) =>
        s"$al.$ax = w.$ax${bit + 1}"
      }.mkString(" AND ")
      (s"$weight * $al.v", s"JOIN series $al ON $on")
    }
    val brackets = axes.map { ax =>
      s"""    (SELECT max(s.$ax) FROM series s WHERE s.$ax <= pr.$ax) AS ${ax}1,
         |    (SELECT min(s.$ax) FROM series s WHERE s.$ax > pr.$ax) AS ${ax}2""".stripMargin
    }.mkString(",\n")
    val fr = axes.map(ax => s"($ax - ${ax}1) / (${ax}2 - ${ax}1) AS f$ax")
      .mkString(", ")
    s"""WITH series AS (
       |  SELECT CAST(floor(epoch(ts) / 518400) * 518400 AS DOUBLE) AS t,
       |         CAST(user_id % 3 AS DOUBLE) AS u,
       |         CAST(event_id % 2 AS DOUBLE) AS p,
       |         CAST(length(event_type) % 2 AS DOUBLE) AS q,
       |         avg(value) AS v
       |  FROM events GROUP BY 1, 2, 3, 4),
       |hull AS (SELECT min(t) AS tmin, max(t) AS tmax,
       |                min(u) AS umin, max(u) AS umax,
       |                min(p) AS pmin, max(p) AS pmax,
       |                min(q) AS qmin, max(q) AS qmax FROM series),
       |fr(id, f) AS (VALUES $fracsSql),
       |probes AS (SELECT id, tmin + f * (tmax - tmin) AS t,
       |                  umin + (1 - f) * (umax - umin) AS u,
       |                  pmin + f * (pmax - pmin) AS p,
       |                  qmin + (1 - f) * (qmax - qmin) AS q
       |           FROM fr, hull),
       |br AS (
       |  SELECT pr.id, pr.t, pr.u, pr.p, pr.q,
       |$brackets
       |  FROM probes pr),
       |w AS (SELECT *, $fr FROM br)
       |SELECT w.id,
       |  ${corners.map(_._1).mkString("", "\n    + ", "")} AS v
       |FROM w
       |${corners.map(_._2).mkString("\n")}""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "g1_interp_1d" -> interpOracle,
    "g4_interp_4d" -> g4Oracle,
    // tiers 2 and 3 implement identical semantics → identical oracle
    "g2_interp_broadcast" -> interpOracle,

    // bilinear: four bracketing corners, product weights
    "g3_interp_2d" ->
      s"""WITH series AS (
         |  SELECT CAST(floor(epoch(ts) / 518400) * 518400 AS DOUBLE) AS t,
         |         CAST(user_id % 4 AS DOUBLE) AS u,
         |         avg(value) AS v
         |  FROM events GROUP BY 1, 2),
         |hull AS (SELECT min(t) AS tmin, max(t) AS tmax,
         |                min(u) AS umin, max(u) AS umax FROM series),
         |fr(id, f) AS (VALUES $fracsSql),
         |probes AS (SELECT id, tmin + f * (tmax - tmin) AS t,
         |                  umin + (1 - f) * (umax - umin) AS u
         |           FROM fr, hull),
         |br AS (
         |  SELECT p.id, p.t, p.u,
         |    (SELECT max(s.t) FROM series s WHERE s.t <= p.t) AS t1,
         |    (SELECT min(s.t) FROM series s WHERE s.t > p.t) AS t2,
         |    (SELECT max(s.u) FROM series s WHERE s.u <= p.u) AS u1,
         |    (SELECT min(s.u) FROM series s WHERE s.u > p.u) AS u2
         |  FROM probes p),
         |w AS (SELECT *, (t - t1) / (t2 - t1) AS ft,
         |               (u - u1) / (u2 - u1) AS fu FROM br)
         |SELECT w.id,
         |  (1 - ft) * (1 - fu) * s11.v + ft * (1 - fu) * s21.v
         |    + (1 - ft) * fu * s12.v + ft * fu * s22.v AS v
         |FROM w
         |JOIN series s11 ON s11.t = w.t1 AND s11.u = w.u1
         |JOIN series s21 ON s21.t = w.t2 AND s21.u = w.u1
         |JOIN series s12 ON s12.t = w.t1 AND s12.u = w.u2
         |JOIN series s22 ON s22.t = w.t2 AND s22.u = w.u2""".stripMargin
  )
}
