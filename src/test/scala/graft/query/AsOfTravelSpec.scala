package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q185 time-travel read: interval-slice semantics against a
  * latest-change-wins recompute from the raw orders.
  */
class AsOfTravelSpec extends SparkSpec {

  private val T = java.sql.Timestamp.valueOf("1998-06-01 00:00:00")

  test("exactly one version per customer born before T, none after") {
    val df = SparkEntry.queries("q185_scd2_time_travel")(spark, sf)
    val keys = df.select("o_custkey").collect().map(_.getLong(0))
    assert(keys.distinct.length == keys.length, "interval tiling must yield one row per key")
    // timestamp checks stay in the engine (ts physical type varies
    // across testdata generations)
    assert(df.filter(col("effective_from") > lit(T)).count() == 0)
    assert(df.filter(col("effective_to").isNotNull && col("effective_to") <= lit(T)).count() == 0)
  }

  test("as-of priority equals the latest change row at or before T") {
    // independent recompute straight from orders: per customer, the
    // priority of the latest (orderdate, orderkey) change <= T
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val latest = graft.Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_orderpriority"))
      .filter(col("o_orderdate") <= lit(T))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
      .filter(col("rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val asOf = SparkEntry.queries("q185_scd2_time_travel")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(asOf.keySet == latest.keySet,
      "customers visible at T must be exactly those with an order at or before T")
    asOf.foreach { case (k, p) =>
      assert(p == latest(k), s"customer $k: as-of priority $p vs recomputed ${latest(k)}")
    }
  }
}
