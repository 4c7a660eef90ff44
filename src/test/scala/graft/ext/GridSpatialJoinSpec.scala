package graft.ext

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q181 grid-blocked radius join: the registered oracle is the
  * brute-force all-pairs filter, so the driver proves losslessness on
  * the full input. Here: an in-engine blocked ≡ brute check plus the
  * structural guarantees (each pair exactly once, radius respected,
  * and cell-BOUNDARY pairs — the ones the 3×3 neighbor probe exists
  * for — actually present).
  */
class GridSpatialJoinSpec extends SparkSpec {

  private def result(dir: String) =
    SparkEntry.queries("q181_grid_spatial_join")(spark, dir).collect()

  test("blocked join equals brute force over the derived points at sf0.001") {
    // re-derive the point field exactly as the query does
    val cust = graft.Tables.customer(spark, sf)
    val n = cust.agg(countDistinct(col("c_custkey")).as("npts"))
    val pts = cust.crossJoin(broadcast(n))
      .withColumn("h", md5(col("c_custkey").cast("string")))
      .select(col("c_custkey").as("id"),
        (conv(substring(col("h"), 1, 12), 16, 10).cast("long") % (col("npts") * 5000L)).as("x"),
        (conv(substring(col("h"), 13, 12), 16, 10).cast("long") % 5000L).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (i1, x1, y1) <- pts; (i2, x2, y2) <- pts
      if i1 < i2 && math.abs(x1 - x2) <= 500 && math.abs(y1 - y2) <= 500
    } yield (i1, i2)).toSet
    val blocked = result(sf).map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute)
    assert(blocked.nonEmpty, "derived field must yield neighbor pairs at sf0.001")
  }

  test("each pair appears exactly once and respects the radius") {
    val rows = result("/root/testdata/sf0.01")
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length, "no pair may meet twice")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) <= 500 && r.getLong(3) <= 500)
    }
  }

  test("cell-boundary pairs survive (the 3x3 neighbor probe is exercised)") {
    // a pair with dx_u or dy_u > 0 whose coordinates straddle a
    // multiple of 500 lives in different cells; with 22+ pairs at
    // sf0.01 at least one must cross (same-cell-only would mean the
    // neighbor offsets silently stopped matching)
    val rows = result("/root/testdata/sf0.01")
    assert(rows.exists(r => r.getLong(2) > 0 || r.getLong(3) > 0))
    // reconstruct cells from the registered output is impossible from
    // distances alone, so recheck via the derivation: any pair at
    // distance > 0 in a field of cell side 500 crosses with prob ~dx/500;
    // assert structurally instead: pair count matches the brute oracle
    // (covered above) AND distances reach near the radius bound
    assert(rows.map(r => math.max(r.getLong(2), r.getLong(3))).max > 250,
      "distances should approach the radius bound if boundary pairs are kept")
  }
}
