package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q202 weighted quantiles + q203 Gini: exact recomputes from the raw
  * tables.
  */
class WeightedStatsSpec extends SparkSpec {

  test("q202: each percentile is the first value whose cumulative weight crosses the threshold") {
    val lens = graft.Tables.documents(spark, sf)
      .select(col("n_chars")).collect().map(_.getLong(0)).sorted
    val total = lens.sum
    val got = SparkEntry.queries("q202_weighted_quantiles")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set(25L, 50L, 75L, 90L, 99L))
    got.foreach { case (p, (v, tw)) =>
      assert(tw == total)
      val thresh = (p * total + 99) / 100
      var cum = 0L
      val expected = lens.find { x => cum += x; cum >= thresh }.get
      assert(v == expected, s"pct $p")
      // weighted median must be >= the unweighted one (longs carry weight)
      if (p == 50) assert(v >= lens((lens.length + 1) / 2 - 1))
    }
  }

  test("q203: gini matches the rank-formula recompute and sits strictly inside (0, 1)") {
    val rev = graft.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = rev.sortBy(t => (t._2, t._1)).map(_._2)
    val n = sorted.length.toLong
    val sc = sorted.map(BigInt(_)).sum
    val num = sorted.zipWithIndex.map { case (c, idx) =>
      (2 * BigInt(idx + 1) - n - 1) * c
    }.sum
    val expected = (num * 1000000 / (BigInt(n) * sc)).toLong
    val r = SparkEntry.queries("q203_gini_concentration")(spark, sf).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == sc.toLong)
    assert(r.getLong(2) == expected)
    assert(r.getLong(2) > 0 && r.getLong(2) < 1000000)
  }
}
