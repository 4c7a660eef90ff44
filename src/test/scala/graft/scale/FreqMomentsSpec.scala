package graft.scale

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q197 F2 statistics: exact recompute for one column plus the
  * moment inequalities every row must satisfy.
  */
class FreqMomentsSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("q197_frequency_moments")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("o_custkey stats match a driver-side recompute") {
    val counts = graft.Tables.orders(spark, sf).select(col("o_custkey")).collect()
      .map(_.getLong(0)).groupBy(identity).map { case (_, v) => v.length.toLong }.toSeq
    val (n, ndv, f2, mx) = rows("o_custkey")
    assert(n == counts.sum)
    assert(ndv == counts.length)
    assert(f2 == counts.map(c => c * c).sum)
    assert(mx == counts.max)
  }

  test("moment inequalities hold for every analyzed column") {
    rows.foreach { case (c, (n, ndv, f2, mx)) =>
      assert(f2 >= n, s"$c: F2 >= F1 always")
      assert(f2 <= n * mx, s"$c: F2 bounded by n*max")
      assert(mx <= n && ndv <= n, c)
      // self-join size of a key column is n when and only when unique
      if (ndv == n) assert(f2 == n, s"$c unique implies F2 = n")
    }
    // the enum column must show heavy keys, the id columns must not
    assert(rows("o_orderpriority")._4 > rows("o_custkey")._4)
  }
}
