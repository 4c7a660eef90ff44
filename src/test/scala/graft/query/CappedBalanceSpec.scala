package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q199 clamp-at-zero recurrence: exact per-user fold recompute, and
  * proof the clamp actually fires (else the query degenerates to a
  * plain running sum).
  */
class CappedBalanceSpec extends SparkSpec {

  test("per-user balance and clamp count match a sequential fold") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (Seq("purchase", "error").contains(r.getString(4))) -r.getLong(3) else r.getLong(3)))
    val expected = ev.groupBy(_._1).map { case (u, rows) =>
      var bal = 0L; var clamps = 0L
      rows.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, d) =>
        if (bal + d < 0) { clamps += 1; bal = 0 } else bal += d
      }
      u -> (rows.length.toLong, bal, clamps)
    }
    val got = SparkEntry.queries("q199_capped_balance")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    assert(got.values.exists(_._3 > 0), "the clamp must fire somewhere in real data")
    assert(got.values.forall(_._2 >= 0), "balances can never go negative")
  }
}
