package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q205 co-purchase similarity: the full pair ranking recomputed
  * driver-side from the raw baskets (distinct membership, pairwise
  * co-counts, squared-cosine ppm).
  */
class CopurchaseSpec extends SparkSpec {

  test("top co-purchase pairs match a brute-force basket recompute") {
    val baskets = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val itemN = baskets.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val co = baskets.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      .filter(_._2 >= 2)
    val expected = co.toSeq.map { case ((p1, p2), c) =>
      (p1, p2, c, itemN(p1), itemN(p2), c * c * 1000000L / (itemN(p1) * itemN(p2)))
    }.sortBy { case (p1, p2, _, _, _, s) => (-s, p1, p2) }.take(20)
    val got = SparkEntry.queries("q205_copurchase_similarity")(spark, sf)
      .select("p1", "p2", "co", "n1", "n2", "cos2_ppm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.head._6 > 0, "top pair must have positive cos2")
  }
}
