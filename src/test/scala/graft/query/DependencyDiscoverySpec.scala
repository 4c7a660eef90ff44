package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q206 FD discovery + q207 inclusion-dependency discovery: the g3
  * violation measure and the containment fractions recomputed
  * driver-side, plus the schema truths they must surface (keys hold,
  * star FKs contained, the events coverage gap reported partial).
  */
class DependencyDiscoverySpec extends SparkSpec {

  test("fd violation mass matches a driver-side g3 recompute") {
    val part = graft.Tables.part(spark, sf)
      .select(col("p_brand"), col("p_type")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expectedViol = part.groupBy(_._1).values
      .map(g => g.size - g.groupBy(_._2).values.map(_.size).max).sum.toLong
    val got = SparkEntry.queries("q206_fd_discovery")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getBoolean(5))).toMap
    assert(got("part.p_brand->p_type")._2 == expectedViol)
    assert(got("part.p_brand->p_type")._1 == part.length.toLong)
    // key columns determine everything: zero violations
    assert(got("orders.o_orderkey->o_orderstatus")._3)
    assert(got("nation.n_nationkey->n_regionkey")._3)
    // the planted non-FDs are actually violated on this data
    assert(!got("part.p_brand->p_type")._3)
    assert(!got("orders.o_custkey->o_orderpriority")._3)
  }

  test("inclusion containment matches a driver-side set recompute") {
    val custkeys = graft.Tables.customer(spark, sf)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val userids = graft.Tables.events(spark, sf)
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).toSet
    val got = SparkEntry.queries("q207_inclusion_deps")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toMap
    // the star-schema FKs are fully contained
    assert(got("lineitem.l_orderkey<=orders.o_orderkey")._4)
    assert(got("orders.o_custkey<=customer.c_custkey")._4)
    assert(got("events.user_id<=customer.c_custkey")._4)
    // the partial case reports the exact containment, not FK-ness
    val (nLhs, nCont, ppm, isFk) = got("customer.c_custkey<=events.user_id")
    assert(nLhs == custkeys.size.toLong)
    assert(nCont == custkeys.count(userids.contains).toLong)
    assert(ppm == nCont * 1000000L / nLhs && !isFk && nCont < nLhs)
  }
}
