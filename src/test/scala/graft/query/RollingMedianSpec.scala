package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q198 rolling median: every window recomputed driver-side, with the
  * gap-correct window-size contract.
  */
class RollingMedianSpec extends SparkSpec {

  test("every day's window median and size match the calendar recompute") {
    val daily = graft.Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("date").as("day"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .groupBy("day").agg(sum(col("c")).as("c"))
      .select(datediff(col("day"), lit("1970-01-01").cast("date")).as("d"), col("c"))
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("q198_rolling_median")(spark, sf).collect()
    assert(rows.length == daily.size)
    rows.foreach { r =>
      val d = r.getTimestamp(0).toLocalDateTime.toLocalDate.toEpochDay
      val window = (-3L to 3L).flatMap(o => daily.get(d + o)).sorted
      assert(r.getLong(2) == window.length, s"day $d window size")
      assert(r.getLong(3) == window((window.length + 1) / 2 - 1), s"day $d median")
      assert(r.getLong(1) == daily(d))
    }
    // sparse stretches must produce sub-7 windows (the gap contract)
    assert(rows.exists(_.getLong(2) < 7) && rows.exists(_.getLong(2) == 7))
  }
}
