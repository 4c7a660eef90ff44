package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q215 frequent triples: brute-force recompute, plus proof the
  * Apriori prune is lossless (every frequent triple survives it).
  */
class FrequentItemsetsSpec extends SparkSpec {

  test("top frequent triples match brute force; apriori prune is lossless") {
    val baskets = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).map { case (ok, xs) => ok -> xs.map(_._2).distinct.sorted }
    val tripleCounts = baskets.values.flatMap { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length; k <- (j + 1) until ps.length)
        yield (ps(i), ps(j), ps(k))
    }.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      .filter(_._2 >= 2)
    val expected = tripleCounts.toSeq
      .map { case ((a, b, c), s) => (a, b, c, s) }
      .sortBy { case (a, b, c, s) => (-s, a, b, c) }.take(20)
    val got = SparkEntry.queries("q215_frequent_itemsets")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // anti-monotonicity sanity: every frequent triple's sub-pairs are
    // frequent (so the engine's pre-count prune cannot have lost one)
    val pairCounts = baskets.values.flatMap { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    tripleCounts.keys.foreach { case (a, b, c) =>
      assert(pairCounts((a, b)) >= 2 && pairCounts((a, c)) >= 2 && pairCounts((b, c)) >= 2)
    }
    assert(got.nonEmpty, "corpus has no frequent triples - demo is vacuous")
  }
}
