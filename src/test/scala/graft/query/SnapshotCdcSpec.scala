package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q195 snapshot-diff CDC: I/U sets recomputed independently from the
  * raw orders; D pinned as the structural zero the scaladoc claims.
  */
class SnapshotCdcSpec extends SparkSpec {

  private val T1 = "1997-06-01 00:00:00"
  private val T2 = "1998-06-01 00:00:00"

  /** Priority of each customer's latest change at or before t (the
    * as-of value), straight from orders.
    */
  private def stateAt(t: String): Map[Long, String] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    graft.Tables.orders(spark, sf)
      .filter(col("o_orderdate") <= lit(t).cast("timestamp"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect().map(r => r.getAs[Long]("o_custkey") -> r.getAs[String]("o_orderpriority"))
      .toMap
  }

  test("emitted ops are exactly the I/U delta between the two as-of states; D is structurally zero") {
    val s1 = stateAt(T1)
    val s2 = stateAt(T2)
    val rows = SparkEntry.queries("q195_snapshot_cdc")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)), Option(r.getString(3))))
    val inserts = rows.filter(_._1 == "I").map(_._2).toSet
    val updates = rows.filter(_._1 == "U").map(r => r._2 -> (r._3.get, r._4.get)).toMap
    assert(!rows.exists(_._1 == "D"),
      "a single open-ended history cannot lose keys between snapshots")
    assert(inserts == s2.keySet -- s1.keySet, "INSERTs must be the newly-born keys")
    val expectedU = s1.keySet.filter(k => s2(k) != s1(k))
      .map(k => k -> (s1(k), s2(k))).toMap
    assert(updates == expectedU, "UPDATEs must be exactly the changed-payload keys")
    // unchanged keys must NOT be emitted
    assert(rows.length == inserts.size + updates.size)
    assert(inserts.nonEmpty && updates.nonEmpty, "both live branches must fire on real data")
  }
}
