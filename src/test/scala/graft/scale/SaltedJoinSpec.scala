package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves q144's mechanism, not just its result (the oracle covers the
  * result): the salted join (a) equals the unsalted join row-for-row,
  * (b) actually SPREADS the hot key — all 16 salts occupied, no
  * (key, salt) cell holding more than a fraction of the hot key's
  * rows — and (c) does not inflate non-hot dim rows.
  */
class SaltedJoinSpec extends SparkSpec {

  private val Hot = 42L
  private val Buckets = 16

  private def fixtures = {
    val ev = graft.Tables.events(spark, sf)
      .withColumn("uid",
        when(pmod(col("user_id"), lit(10)) < 5, lit(Hot)).otherwise(col("user_id")))
      .select(col("uid"), col("event_id"), col("value"))
    val dim = ev.select(col("uid")).distinct()
      .withColumn("segment",
        when(col("uid") === Hot, lit("bot")).otherwise(lit("organic")))
    (ev, dim)
  }

  test("salted join result equals the unsalted join") {
    val (ev, dim) = fixtures
    val salted = Skew.saltedJoin(ev, dim, Seq("uid"), col("uid") === Hot,
      Buckets, col("event_id"))
    val plain = ev.join(dim, "uid")
    assert(salted.count() == plain.count())
    assert(salted.join(plain, Seq("uid", "event_id", "segment"), "left_anti").isEmpty)
  }

  test("hot key spreads across all salts; no cell keeps the full hot row set") {
    val (ev, dim) = fixtures
    val (f, _) = Skew.saltedSides(ev, dim, col("uid") === Hot, Buckets, col("event_id"))
    val perSalt = f.filter(col("uid") === Hot)
      .groupBy(col("__salt")).count().collect()
    val total = perSalt.map(_.getLong(1)).sum
    assert(perSalt.length == Buckets,
      s"expected $Buckets occupied salts, got ${perSalt.length}")
    val maxCell = perSalt.map(_.getLong(1)).max
    assert(maxCell * 4 < total,
      s"one salt cell holds $maxCell of $total hot rows — not spread")
    // non-hot fact rows keep salt 0 (they must find the unreplicated dim row)
    assert(f.filter(col("uid") =!= Hot && col("__salt") =!= 0).isEmpty)
  }

  test("dim replication is buckets x hot rows only") {
    val (ev, dim) = fixtures
    val (_, d) = Skew.saltedSides(ev, dim, col("uid") === Hot, Buckets, col("event_id"))
    val byHot = d.groupBy((col("uid") === Hot).as("hot"))
      .agg(count(lit(1)).as("n"), countDistinct(col("uid")).as("nk"),
        countDistinct(col("__salt")).as("ns"))
      .collect().map(r => r.getBoolean(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byHot(true)._1 == Buckets * byHot(true)._2)
    assert(byHot(true)._3 == Buckets, "hot dim rows must cover every salt exactly once")
    assert(byHot(false)._1 == byHot(false)._2)
    assert(byHot(false)._3 == 1L, "non-hot dim rows must keep the single salt 0")
  }
}
