package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q192 robust MAD stats: full driver-side recompute of both median
  * passes and the cross-multiplied outlier rule.
  */
class RobustMadSpec extends SparkSpec {

  test("median, MAD, and outlier counts match an exact recompute") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def lowerMedian(xs: Seq[(Long, Long)]): Long = { // (tieKey, value)
      val sorted = xs.sortBy(t => (t._2, t._1))
      sorted((sorted.length + 1) / 2 - 1)._2
    }
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val m = lowerMedian(rows.map(r => (r._2, r._3)).toSeq)
      val devs = rows.map(r => (r._2, math.abs(r._3 - m))).toSeq
      val mad = lowerMedian(devs)
      val out = devs.count { case (_, d) => d * 10000 > mad * 44478 }
      t -> (rows.length.toLong, m, mad, out.toLong)
    }
    val got = SparkEntry.queries("q192_robust_mad")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expected)
    assert(got.values.exists(_._4 > 0), "some group should flag outliers at 3 robust sigma")
  }
}
