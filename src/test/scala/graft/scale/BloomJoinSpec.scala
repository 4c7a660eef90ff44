package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves q153's mechanism, not just its result (the oracle's plain
  * join covers the result): the Bloom pre-filter (a) passes EVERY
  * lineitem row whose order is actually urgent — no false negatives —
  * and (b) drops most non-matching rows map-side, so the join shuffle
  * sees a fraction of the fact table.
  */
class BloomJoinSpec extends SparkSpec {

  private val Bits = 1 << 18
  private val K    = 6

  private def bloomPass = {
    import spark.implicits._
    val urgent = graft.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
    val kh = md5(to_binary(col("o_orderkey").cast("string"), lit("utf-8")))
    val sketch = urgent
      .select(graft.ext.Decontam.bloomH1(kh).as("h1"), graft.ext.Decontam.bloomH2(kh).as("h2"))
      .as[(Long, Long)]
      .groupByKey(_ => 0)
      .agg(graft.functions.BloomAgg(Bits, K).toColumn.name("bloom"))
      .toDF("g", "bloom").select(col("bloom"))
    val ph = md5(to_binary(col("l_orderkey").cast("string"), lit("utf-8")))
    val pass = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        graft.ext.Decontam.bloomH1(ph).as("h1"), graft.ext.Decontam.bloomH2(ph).as("h2"))
      .crossJoin(broadcast(sketch))
      .filter(graft.functions.bloom_might_contain(col("bloom"), col("h1"), col("h2"), Bits, K))
      .select(col("l_orderkey"))
    (urgent, pass)
  }

  test("bloom pre-filter has no false negatives") {
    val (urgent, pass) = bloomPass
    val trueMatches = graft.Tables.lineitem(spark, sf).select(col("l_orderkey"))
      .join(urgent.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
    // every truly-matching row must survive the pre-filter
    assert(trueMatches.exceptAll(pass).isEmpty,
      "a lineitem row matching an urgent order was dropped by the Bloom filter")
  }

  test("bloom pre-filter drops most non-matching fact rows") {
    val (_, pass) = bloomPass
    val total = graft.Tables.lineitem(spark, sf).count()
    val kept = pass.count()
    // urgent selectivity ~18% + ~1% Bloom false positives: require the
    // pre-filter to shed more than half the fact table
    assert(kept < total / 2, s"bloom kept $kept of $total rows — no real reduction")
  }
}
