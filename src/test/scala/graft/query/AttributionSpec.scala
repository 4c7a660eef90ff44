package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Exercises q162's middle-split + remainder arithmetic, which the
  * testdata never reaches (no purchase there has >2 qualifying
  * views): with k middles each gets `200000 div k` ppm and the
  * `200000 mod k` remainder lands one ppm each on the k earliest —
  * so credits sum to exactly 1,000,000 at every view count.
  */
class AttributionSpec extends SparkSpec {

  /** Synthetic events table in the Tables.events physical shape
    * (ts = raw nanos as INT64).
    */
  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_attr").toString
    rows.map { case (eid, tsUs, uid, typ) => (eid, tsUs * 1000L, uid, typ, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("middle credit split and remainder distribution are exact") {
    val hour = 3600000000L
    val T = 100L * 86400000000L
    val rows = Seq.newBuilder[(Long, Long, Long, String)]
    // user 1: 7 views -> 5 middles, 200000 div 5 = 40000 rem 0
    (1 to 7).foreach(i => rows += ((100L + i, T - (8 - i) * hour, 1L, "view")))
    rows += ((199L, T, 1L, "purchase"))
    // user 2: 5 views -> 3 middles, 200000 div 3 = 66666 rem 2
    (1 to 5).foreach(i => rows += ((200L + i, T - (6 - i) * hour, 2L, "view")))
    rows += ((299L, T, 2L, "purchase"))
    // user 3: single view -> full credit
    rows += ((301L, T - hour, 3L, "view"))
    rows += ((399L, T, 3L, "purchase"))
    // user 4: two views -> 500000 each
    rows += ((401L, T - 2 * hour, 4L, "view"))
    rows += ((402L, T - hour, 4L, "view"))
    rows += ((499L, T, 4L, "purchase"))
    // user 5: only a stale view (outside 24h) -> purchase unattributed
    rows += ((501L, T - 30L * 86400000000L, 5L, "view"))
    rows += ((599L, T, 5L, "purchase"))

    val dir = writeEvents(rows.result())
    val got = SparkEntry.queries("q162_position_attribution")(spark, dir).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("view_id")) ->
        r.getAs[Long]("credit_ppm")).toMap

    val expect = Map(
      // user 1: first 400000, middles 40000 x5, last 400000
      (199L, 101L) -> 400000L, (199L, 102L) -> 40000L, (199L, 103L) -> 40000L,
      (199L, 104L) -> 40000L, (199L, 105L) -> 40000L, (199L, 106L) -> 40000L,
      (199L, 107L) -> 400000L,
      // user 2: remainder 2 -> earliest two middles get 66667
      (299L, 201L) -> 400000L, (299L, 202L) -> 66667L, (299L, 203L) -> 66667L,
      (299L, 204L) -> 66666L, (299L, 205L) -> 400000L,
      (399L, 301L) -> 1000000L,
      (499L, 401L) -> 500000L, (499L, 402L) -> 500000L,
    )
    assert(got == expect, s"credit map mismatch: $got")
    got.groupBy(_._1._1).foreach { case (p, credits) =>
      assert(credits.values.sum == 1000000L, s"purchase $p credits do not sum to 1e6")
    }
  }
}
