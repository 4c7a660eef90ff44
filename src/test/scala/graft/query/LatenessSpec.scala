package graft.query

import graft.{SparkEntry, SparkSpec}

/** The driver testdata arrives perfectly in-order (every q164 row
  * lands in band 0 — a legitimate audit finding, but one that leaves
  * the banding ladder untested), so this spec plants known disorder
  * and checks every band boundary by hand.
  */
class LatenessSpec extends SparkSpec {

  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_late").toString
    rows.map { case (eid, tsUs, uid, typ) => (eid, tsUs * 1000L, uid, typ, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("lateness bands match hand-computed disorder") {
    val s = 1000000L // one second in micros
    val base = 100L * 86400L * s
    val dir = writeEvents(Seq(
      (1L, base, 1L, "click"),                      // first arrival: in-order
      (2L, base - 30 * s, 1L, "click"),             // 30s late  -> 2_le_1min
      (3L, base + s / 5, 1L, "click"),              // new max: in-order
      (4L, base + s / 5 - s / 2, 1L, "click"),      // 0.5s late -> 1_le_1s
      (5L, base + s / 5 - 7200 * s, 1L, "click"),   // 2h late   -> 4_le_1d
      (6L, base + s / 5 - 90000 * s, 1L, "click"),  // 25h late  -> 5_gt_1d
      (7L, base + s / 5 - 600 * s, 1L, "click"),    // 10min late-> 3_le_1h
    ))
    val got = SparkEntry.queries("q164_lateness_audit")(spark, dir).collect()
      .map(r => r.getAs[String]("band") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("max_late_us"))).toMap
    assert(got == Map(
      "0_in_order" -> ((2L, 0L)),
      "1_le_1s"    -> ((1L, s / 2)),
      "2_le_1min"  -> ((1L, 30 * s)),
      "3_le_1h"    -> ((1L, 600 * s)),
      "4_le_1d"    -> ((1L, 7200 * s)),
      "5_gt_1d"    -> ((1L, 90000 * s)),
    ), s"band map mismatch: $got")
  }
}
