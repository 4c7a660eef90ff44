package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q204 Mann–Whitney: the doubled-U statistic and rank-biserial
  * effect size recomputed driver-side from first principles
  * (midranks over the pooled sample, U = R − n(n+1)/2).
  */
class MannWhitneySpec extends SparkSpec {

  test("doubled U and rank-biserial ppm match a midrank recompute") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = docs.length.toLong
    // doubled midrank per value: 2*(#below) + #tied + 1
    val sorted = docs.map(_._2).sorted
    val rank2 = sorted.distinct.map { v =>
      val below = sorted.count(_ < v).toLong
      val tied = sorted.count(_ == v).toLong
      v -> (2L * below + tied + 1L)
    }.toMap
    val expected = docs.map(_._1).distinct.map { src =>
      val mine = docs.filter(_._1 == src).map(_._2)
      val ns = mine.length.toLong
      val nr = n - ns
      val r2 = mine.map(rank2).sum
      val u2 = r2 - ns * (ns + 1)
      src -> (ns, nr, u2, u2 * 1000000L / (ns * nr) - 1000000L)
    }.toMap
    val got = SparkEntry.queries("q204_mann_whitney")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expected)
    // sanity: U2 is bounded by its maximum 2*n_s*n_r, and at least one
    // source is shifted off-center (|r| > 0)
    got.foreach { case (src, (ns, nr, u2, _)) =>
      assert(u2 >= 0 && u2 <= 2 * ns * nr, s"$src U2 out of range")
    }
    assert(got.values.exists(_._4 != 0L), "some source must shift from the rest")
  }
}
