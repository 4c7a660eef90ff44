package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q186 autocorrelation: lag-1 moments recomputed driver-side from
  * the daily series, exactly, including the truncated-quotient
  * convention.
  */
class AutocorrelationSpec extends SparkSpec {

  test("lag-1 and lag-7 cells match an exact BigInt recompute") {
    val daily = graft.Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("date").as("day"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .groupBy("day").agg(sum(col("c")).as("c"))
      .select(datediff(col("day"), lit("1970-01-01").cast("date")).as("d"), col("c"))
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("q186_autocorrelation")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == (1L to 7L).toSet)
    for (lag <- Seq(1L, 7L)) {
      val pairs = daily.keys.toSeq.sorted
        .flatMap(d => daily.get(d + lag).map(y => (BigInt(daily(d)), BigInt(y))))
      val n = BigInt(pairs.length)
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      def q(num: BigInt) = (num / (n * n)) // BigInt / truncates toward zero
      val (gn, cov, vx, vy) = rows(lag)
      assert(gn == pairs.length)
      assert(BigInt(cov) == q(n * sxy - sx * sy), s"lag $lag cov")
      assert(BigInt(vx) == q(n * sxx - sx * sx), s"lag $lag vx")
      assert(BigInt(vy) == q(n * syy - sy * sy), s"lag $lag vy")
    }
  }

  test("matched-pair counts shrink as the lag leaves the sparse series' gaps") {
    val rows = SparkEntry.queries("q186_autocorrelation")(spark, sf).collect()
    val days = graft.Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("date")).distinct().count()
    rows.foreach(r => assert(r.getLong(1) < days, "a lag can never match every day"))
  }
}
