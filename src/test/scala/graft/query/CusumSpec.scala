package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q212 CUSUM changepoint: argmax, magnitudes, and before/after level
  * estimates recomputed driver-side from the raw daily sums.
  */
class CusumSpec extends SparkSpec {

  test("changepoint and level estimates match a driver recompute") {
    val daily = graft.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("x"))
      .groupBy("event_type", "day").agg(sum(col("x")).as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (t, rows) =>
      val xs = rows.sortBy(_._2).map(r => (r._2, r._3))
      val n = xs.length.toLong
      val total = xs.map(_._2).sum
      val cums = xs.scanLeft(0L)(_ + _._2).tail
      val scored = xs.zip(cums).zipWithIndex.map { case (((day, _), cum), idx) =>
        val i = idx + 1L
        (day, i, cum, math.abs(n * cum - i * total))
      }
      val best = scored.sortBy { case (day, _, _, d) => (-d, day) }.head
      val (day, i, cum, dAbs) = best
      t -> (n, day,
        dAbs,
        if (total != 0) dAbs * 1000000L / (n * math.abs(total)) else -1L,
        cum / i,
        if (n > i) (total - cum) / (n - i) else Long.MinValue)
    }
    val got = SparkEntry.queries("q212_cusum_changepoint")(spark, sf).collect()
      .map { r =>
        r.getString(0) -> (r.getLong(1),
          r.getTimestamp(2).toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate.toString,
          r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) Long.MinValue else r.getLong(6))
      }.toMap
    assert(got == expected)
    // the located shift is a real level move for at least one series
    assert(got.values.exists { case (_, _, _, _, before, after) =>
      after != Long.MinValue && before != after
    })
  }
}
