package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q201 KS drift: every source's distance and argmax recomputed from
  * a driver-side construction of both step functions.
  */
class KsDriftSpec extends SparkSpec {

  test("ks distance and argmax match an exact step-function recompute") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val values = docs.map(_._2).distinct.sorted
    val n = docs.length.toLong
    val expected = docs.map(_._1).distinct.map { src =>
      val mine = docs.filter(_._1 == src).map(_._2)
      val ns = mine.length.toLong
      val nr = n - ns
      val best = values.map { v =>
        val cs = mine.count(_ <= v).toLong
        val cr = docs.count(_._2 <= v) - cs
        (math.abs(cs * nr - cr * ns), v)
      }.sortBy { case (d, v) => (-d, v) }.head
      src -> (ns, nr, best._1 * 1000000L / (ns * nr), best._2)
    }.toMap
    val got = SparkEntry.queries("q201_ks_drift")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expected)
    assert(got.values.exists(_._3 > 0), "some source must diverge from the rest")
  }
}
