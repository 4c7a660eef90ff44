package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Boundary semantics of the temporal joins, on crafted events the
  * synthetic data doesn't contain: exact-timestamp ties and
  * exactly-at-gap pairs.
  */
class TemporalJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_events").toString
    val base = 1700000000000000L // µs
    Seq(
      // user 1: view exactly at the purchase timestamp → MUST match
      (10L, base * 1000, 1L, "view", 1.0, "{}"),
      (11L, base * 1000, 1L, "purchase", 2.0, "{}"),
      // user 2: view 1µs AFTER the purchase → must NOT match
      (20L, (base + 1) * 1000, 2L, "view", 1.0, "{}"),
      (21L, base * 1000, 2L, "purchase", 2.0, "{}"),
      // user 3: two views, later one wins; purchase 5s after
      (30L, base * 1000, 3L, "view", 1.0, "{}"),
      (31L, (base + 1000000) * 1000, 3L, "view", 1.0, "{}"),
      (32L, (base + 6000000) * 1000, 3L, "purchase", 2.0, "{}"),
      // user 4: pair exactly 10 minutes apart → range join includes (<=)
      (40L, base * 1000, 4L, "error", 0.0, "{}"),
      (41L, (base + 600000000L) * 1000, 4L, "error", 0.0, "{}"),
      // user 5: pair 10 minutes + 1µs apart → excluded
      (50L, base * 1000, 5L, "error", 0.0, "{}"),
      (51L, (base + 600000001L) * 1000, 5L, "error", 0.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      // write ts as long nanos — Tables.events reads it via nanosAsLong
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("as-of join: equal-timestamp view matches; later view does not; latest wins") {
    val rows = SparkEntry.queries("q34_asof_join")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        Option(r.getAs[java.lang.Long]("last_view_id")).map(_.toLong)).toMap
    assert(rows(1L) == Some(10L), "tie at identical timestamp must match")
    assert(rows(2L) == None, "view after the purchase must not match")
    assert(rows(3L) == Some(31L), "the most recent prior view wins")
  }

  test("q94 point-in-time join: lossless, unique, and as-of-correct vs the history") {
    val fact = graft.Tables.lineitem(spark, sf)
    val rows = SparkEntry.queries("q94_pit_join")(spark, sf).collect()
    // lossless AND fan-out-free in one equality: a dropped fact would
    // shrink the count, a fact matching two versions would inflate it
    // (the synthetic lineitem has non-unique (orderkey, linenumber)
    // pairs, so per-key distinctness is not assertable here)
    assert(rows.length == fact.count())
    // as-of-correct: the joined version equals the LAST q76 version
    // whose effective_from <= ship date (driver-side replay at sf0.001)
    val hist = SparkEntry.queries("q76_scd2_history")(spark, sf).collect()
      .map(r => (r.getAs[Long]("o_custkey"),
        r.getAs[java.time.LocalDateTime]("effective_from"), r.getAs[Int]("version")))
      .groupBy(_._1)
    rows.foreach { r =>
      val ship = r.getAs[java.time.LocalDateTime]("l_shipdate")
      val expect = hist.getOrElse(r.getAs[Long]("o_custkey"), Array.empty)
        .filter(!_._2.isAfter(ship)).sortBy(_._3).lastOption.map(_._3)
      assert(Option(r.getAs[java.lang.Integer]("version")).map(_.toInt) == expect,
        s"row $r expected version $expect")
    }
  }

  test("range join: exactly-at-gap pair included, gap+1µs excluded") {
    val pairs = SparkEntry.queries("q35_range_join")(spark, dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Long]("gap_us")))
    assert(pairs.exists(p => p._1 == 40L && p._2 == 41L && p._3 == 600000000L),
      s"boundary pair missing from ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 50L),
      s"out-of-gap pair present in ${pairs.toSeq}")
  }
}
