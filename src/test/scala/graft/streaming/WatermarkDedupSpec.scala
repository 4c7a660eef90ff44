package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves q154's state-lifecycle semantics beyond the single-batch
  * oracle gate (where it degenerates to DISTINCT): replayed one file
  * per trigger with the watermark advancing between micro-batches,
  * `dropDuplicatesWithinWatermark` must
  *
  *   1. suppress a duplicate arriving WITHIN the 2-day delay,
  *   2. EVICT a key once the watermark passes its ts + delay, so a
  *      duplicate arriving far later RE-EMITS — the bounded-state
  *      trade q62's unbounded `dropDuplicates` never makes.
  *
  * Two fixture subtleties found empirically: rows at ts ≤ the current
  * watermark are dropped as late (so the base timestamp must sit
  * above the initial epoch-0 watermark), and state cleanup runs
  * against a lagged watermark (event-time stats from batch N set the
  * watermark batch N+1 cleans under), so the eviction needs spacer
  * batches between the watermark-advancing data and the re-arriving
  * duplicate.
  */
class WatermarkDedupSpec extends SparkSpec {

  test("within-delay duplicate suppressed; post-eviction duplicate re-emits") {
    import spark.implicits._
    val day = 86400000000L
    val base = 100 * day // above the initial watermark
    def mk(rows: Seq[(Long, String, Long)]) =
      rows.toDF("user_id", "event_type", "us")
        .select(col("user_id"), col("event_type"),
          expr("timestamp_micros(us)").as("ts"))
    val dir = java.nio.file.Files.createTempDirectory("graft_q154_batches").toString
    // b0: first sightings of (1,click) and (2,view)
    mk(Seq((1L, "click", base), (2L, "view", base))).coalesce(1).write.parquet(s"$dir/b0")
    // b1: (2,view) one hour later — inside the 2-day delay — plus a
    // spacer advancing the watermark to base+8d
    mk(Seq((2L, "view", base + 3600000000L), (9L, "s1", base + 10 * day)))
      .coalesce(1).write.parquet(s"$dir/b1")
    // b2/b3: spacer batches under which cleanup evicts the day-0 keys
    // (expired at base+2d)
    mk(Seq((8L, "s2", base + 20 * day))).coalesce(1).write.parquet(s"$dir/b2")
    mk(Seq((7L, "s3", base + 25 * day))).coalesce(1).write.parquet(s"$dir/b3")
    // b4: (1,click) again at base+30d — state gone, must RE-EMIT
    mk(Seq((1L, "click", base + 30 * day))).coalesce(1).write.parquet(s"$dir/b4")

    val stream = spark.readStream
      .schema(mk(Seq((0L, "x", 0L))).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/b*")
      .withWatermark("ts", "2 days")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    val q = stream.writeStream
      .outputMode("append").format("memory").queryName("q154_replay").start()
    q.processAllAvailable()
    val nBatches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    scala.util.Try(
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir)))
    assert(nBatches >= 5, s"expected a five-batch replay, got $nBatches batches")

    val got = spark.table("q154_replay").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(got == Map(
      (1L, "click") -> 2, // emitted fresh, then re-emitted after eviction
      (2L, "view") -> 1,  // within-delay duplicate suppressed
      (9L, "s1") -> 1,
      (8L, "s2") -> 1,
      (7L, "s3") -> 1,
    ), s"unexpected emissions: $got")
  }
}
