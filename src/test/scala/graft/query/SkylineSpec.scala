package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q182 skyline: the oracle hash-match proves engine parity; these
  * prove the SEMANTICS — the result is exactly the set of
  * non-dominated points of the input.
  */
class SkylineSpec extends SparkSpec {

  private def domStats() = graft.Tables.documents(spark, sf).select(
    col("doc_id"),
    size(split(col("text"), " ")).cast("long").as("nt"),
    size(array_distinct(split(col("text"), " "))).cast("long").as("nd"))
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  private def dominates(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
    a._2 >= b._2 && a._3 >= b._3 && (a._2 > b._2 || a._3 > b._3)

  test("skyline equals the brute-force non-dominated set") {
    val all = domStats()
    val expected = all.filter(p => !all.exists(q => dominates(q, p))).map(_._1).toSet
    val got = SparkEntry.queries("q182_skyline")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("every non-skyline point is dominated by some skyline point") {
    val all = domStats()
    val sky = SparkEntry.queries("q182_skyline")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val skyIds = sky.map(_._1).toSet
    all.filterNot(p => skyIds(p._1)).foreach { p =>
      assert(sky.exists(s => dominates(s, p)),
        s"doc ${p._1} excluded but dominated by no skyline point")
    }
  }
}
