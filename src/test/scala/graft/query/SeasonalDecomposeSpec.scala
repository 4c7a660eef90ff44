package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q183 seasonal decomposition: integer-exact identities the scaled
  * representation must satisfy (the oracle proves engine parity;
  * these prove the arithmetic means what the scaladoc says).
  */
class SeasonalDecomposeSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("q183_seasonal_decompose")(spark, sf).collect()

  test("trend is defined exactly where the calendar ±3-day window is complete") {
    // sf0.001's shipdate series is SPARSE (≈2300 present days across a
    // ~3500-day span) — precisely the regime the value-based RANGE
    // frame exists for: a day's trend must be null unless all 7
    // CALENDAR days around it are present, never silently averaging
    // non-adjacent days like a rows-frame would
    val present = rows.map(r => r.getTimestamp(0).toLocalDateTime.toLocalDate.toEpochDay).toSet
    var nNull = 0L
    rows.foreach { r =>
      val d = r.getTimestamp(0).toLocalDateTime.toLocalDate.toEpochDay
      val complete = (-3L to 3L).forall(o => present(d + o))
      assert(r.isNullAt(2) == !complete, s"day $d: trend null-ness wrong")
      if (!complete) nNull += 1
    }
    assert(nNull > 0 && nNull < rows.length, "both regimes must occur in the fixture")
  }

  test("dev7 = 7*rev - sum7 and the weekday rollup conserves the deviations") {
    var devByWd = Map.empty[Int, (Long, Long)].withDefaultValue((0L, 0L))
    rows.foreach { r =>
      if (!r.isNullAt(2)) {
        assert(r.getLong(3) == 7 * r.getLong(1) - r.getLong(2))
        val wd = r.getInt(4)
        val (s, n) = devByWd(wd)
        devByWd += wd -> (s + r.getLong(3), n + 1)
      }
    }
    rows.foreach { r =>
      val (s, n) = devByWd(r.getInt(4))
      assert(r.getLong(5) == s, "seas_sum7_u must equal the recomputed weekday sum")
      assert(r.getLong(6) == n)
    }
  }

  test("daily grain conserves the lineitem revenue total") {
    val total = graft.Tables.lineitem(spark, sf)
      .select(expr("CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 1000000 AS BIGINT)").as("u"))
      .agg(sum(col("u"))).collect().head.getLong(0)
    assert(rows.map(_.getLong(1)).sum == total)
  }
}
