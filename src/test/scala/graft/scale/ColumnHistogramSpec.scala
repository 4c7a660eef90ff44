package graft.scale

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q184 equi-depth histogram: conservation, disjointness, and an
  * independent driver-side recompute of the value-packed bucket
  * assignment.
  */
class ColumnHistogramSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("q184_column_histogram")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("buckets conserve rows and NDV and form disjoint ordered ranges") {
    val cents = graft.Tables.lineitem(spark, sf)
      .select(expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect().map(_.getLong(0))
    assert(rows.map(_._3).sum == cents.length)
    assert(rows.map(_._2).sum == cents.distinct.length)
    rows.sliding(2).foreach {
      case Array((_, _, _, _, hi), (_, _, _, lo, _)) =>
        assert(hi < lo, "bucket value ranges must be disjoint and increasing")
      case _ =>
    }
  }

  test("bucket assignment matches the value-packed definition exactly") {
    val counts = graft.Tables.lineitem(spark, sf)
      .select(expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect().map(_.getLong(0))
      .groupBy(identity).map { case (v, a) => v -> a.length.toLong }
    val n = counts.values.sum
    var cum = 0L
    val expected = counts.toSeq.sortBy(_._1).map { case (v, cnt) =>
      val b = cum * 10 / n
      cum += cnt
      (v, b)
    }.groupBy(_._2).map { case (b, vs) =>
      b -> (vs.length.toLong, vs.map(_._1).min, vs.map(_._1).max)
    }
    rows.foreach { case (b, ndv, _, lo, hi) =>
      val (endv, elo, ehi) = expected(b)
      assert(ndv == endv && lo == elo && hi == ehi, s"bucket $b mismatch")
    }
    assert(rows.length == expected.size)
  }
}
