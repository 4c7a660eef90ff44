package graft.ext

import graft.QuerySpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial neighbor search — radius joins over point data via
  * fixed-grid cell blocking, the geo member of the blocked-join
  * family (LSH buckets for vectors, deletion neighborhoods for
  * strings, length buckets for names, grid cells for coordinates).
  *
  * The reference pipeline carries real lat/lng points (halte
  * coordinates, `transformer.py` get_lat/get_lng — repaired here by
  * q06 and projected by q12); the testdata tables carry none, so the
  * radius-join demo derives a deterministic synthetic point per
  * customer. The ALGORITHM is the deliverable: grid blocking is how
  * a 100 TB point table finds neighbor pairs without an O(n²) stage.
  */
object Spatial {

  /** Chebyshev radius (µdeg) — also the grid cell side: cell side =
    * radius makes the 3×3 neighborhood provably complete for L∞.
    */
  private val RadiusU = 500L

  /** Points per 25M µdeg² of derived area — the point field's density
    * is held constant across SFs by scaling the domain WIDTH with the
    * point count (area ∝ n), so the expected neighbor-pair yield is
    * ~n/50 at every SF rather than n² vanishing or exploding.
    */
  private val HeightU = 5000L

  /** q181 — RADIUS SELF-JOIN via grid-cell blocking: all point pairs
    * within Chebyshev distance ≤ 500 µdeg. Each point lands in ONE
    * home cell of side = radius; a pair within the radius can differ
    * by at most one cell index per axis, so probing the 3×3 cell
    * neighborhood (probe side exploded ×9, build side keeps its home
    * cell) is a provably LOSSLESS candidate generator, and each pair
    * meets EXACTLY once (cells are unique per point, the offset pair
    * is determined by the two home cells, and id1 < id2 fixes the
    * orientation) — no distinct needed. The equi-join on (cx, cy)
    * shuffles by cell; the exact |Δx| ≤ r ∧ |Δy| ≤ r verify is pure
    * integer arithmetic. At 100 TB: candidate work is bounded by
    * cell occupancy (density × cell area), not n² — the same
    * contract as the LSH bucket join, but with a DETERMINISTIC
    * no-false-negative guarantee; skewed cells (cities) are AQE
    * skew-split like any hot join key. The oracle is the brute-force
    * all-pairs filter — an independent method, so the driver's hash
    * compare proves the blocking lossless on the full input.
    *
    * Coordinates are md5-derived (48-bit hex slices, exact in both
    * engines) over a width that scales with the point count (the
    * 1-row count aggregate broadcasts — the q03/q69 scalar pattern),
    * keeping density and so expected pair yield constant across SFs.
    */
  private def q181(spark: SparkSession, dir: String): DataFrame = {
    val cust = graft.Tables.customer(spark, dir)
    val n = cust.agg(countDistinct(col("c_custkey")).as("npts"))
    val pts = cust
      .crossJoin(broadcast(n))
      .withColumn("h", md5(col("c_custkey").cast("string")))
      .select(
        col("c_custkey").as("id"),
        (conv(substring(col("h"), 1, 12), 16, 10).cast("long")
          % (col("npts") * HeightU)).as("x"),
        (conv(substring(col("h"), 13, 12), 16, 10).cast("long")
          % HeightU).as("y"))
      .withColumn("cx", expr(s"x div $RadiusU"))
      .withColumn("cy", expr(s"y div $RadiusU"))
    val probe = pts
      .withColumn("dx", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("dy", explode(sequence(lit(-1L), lit(1L))))
      .select(col("id").as("id1"), col("x").as("x1"), col("y").as("y1"),
        (col("cx") + col("dx")).as("jcx"), (col("cy") + col("dy")).as("jcy"))
    val build = pts.select(col("id").as("id2"), col("x").as("x2"),
      col("y").as("y2"), col("cx").as("jcx"), col("cy").as("jcy"))
    probe.join(build, Seq("jcx", "jcy"))
      .filter(col("id1") < col("id2") &&
        abs(col("x1") - col("x2")) <= RadiusU &&
        abs(col("y1") - col("y2")) <= RadiusU)
      .select(col("id1"), col("id2"),
        abs(col("x1") - col("x2")).as("dx_u"),
        abs(col("y1") - col("y2")).as("dy_u"))
      .orderBy("id1", "id2")
  }

  private val q181Sql =
    s"""WITH n AS (SELECT COUNT(DISTINCT c_custkey) AS npts FROM customer),
       |pts AS (
       |  SELECT c_custkey AS id,
       |         mod(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12))::BIGINT,
       |             n.npts * $HeightU) AS x,
       |         mod(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 13, 12))::BIGINT,
       |             $HeightU) AS y
       |  FROM customer, n)
       |SELECT a.id AS id1, b.id AS id2,
       |       abs(a.x - b.x) AS dx_u, abs(a.y - b.y) AS dy_u
       |FROM pts a JOIN pts b ON a.id < b.id
       |WHERE abs(a.x - b.x) <= $RadiusU AND abs(a.y - b.y) <= $RadiusU
       |ORDER BY id1, id2""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q181_grid_spatial_join", q181, Some(q181Sql), headline = true),
  )
}
