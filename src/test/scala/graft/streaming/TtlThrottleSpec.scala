package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Proves q141's two load-bearing claims beyond the one-batch oracle
  * gate:
  *
  *  1. EVICTION IS SEMANTICS-FREE — replayed one file per trigger the
  *     watermark advances between micro-batches, so idle keys' state
  *     is actually removed by the EventTimeTimeout branch mid-stream;
  *     the decisions must still equal the one-batch run's.
  *  2. The greedy-throttle invariants hold on the output itself: per
  *     key, consecutive `sent` events are ≥ TTL apart, and every
  *     `suppressed` event is < TTL after the latest preceding `sent`.
  */
class TtlThrottleSpec extends SparkSpec {

  private val TtlUs = 2L * 86400L * 1000000L

  test("multi-batch replay (state evicted mid-stream) equals one-batch result") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
    val cut = ev.agg(expr("percentile_approx(ts_us, 0.5)")).collect()(0).getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_q141_batches").toString
    ev.filter(col("ts_us") <= cut).coalesce(1).write.parquet(s"$dir/b0")
    ev.filter(col("ts_us") > cut).coalesce(1).write.parquet(s"$dir/b1")
    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/b*")
      .withWatermark("ts", "0 seconds")
      .as[ThrottleEvent]
    val q = StreamingQueries.throttleDecisions(stream).toDF().writeStream
      .outputMode("append").format("memory").queryName("q141_two_batch").start()
    q.processAllAvailable()
    val nBatches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    // the memory sink holds the rows; the replay files are done with
    scala.util.Try(
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir)))
    assert(nBatches >= 2, s"expected a multi-batch replay, got $nBatches batches")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getString(1), r.getLong(2))
    val twoBatch = spark.table("q141_two_batch").collect()
      .map(r => key(r) -> r.getString(4)).toMap
    val oneBatch = SparkEntry.queries("q141_ttl_throttle")(spark, sf).collect()
      .map(r => key(r) -> r.getString(4)).toMap
    assert(twoBatch == oneBatch,
      "multi-batch decisions diverged from the one-batch replay")
  }

  test("greedy invariants: sent spacing >= TTL, suppressed within TTL of a sent") {
    val rows = SparkEntry.queries("q141_ttl_throttle")(spark, sf).collect()
    assert(rows.map(_.getString(4)).toSet == Set("sent", "suppressed"))
    rows.groupBy(r => (r.getLong(0), r.getString(1))).foreach { case (k, evs) =>
      var lastSent = Option.empty[Long]
      evs.sortBy(r => (r.getLong(3), r.getLong(2))).foreach { r =>
        val ts = r.getLong(3)
        r.getString(4) match {
          case "sent" =>
            lastSent.foreach(ls => assert(ts - ls >= TtlUs,
              s"$k: sent at $ts only ${ts - ls}us after sent at $ls"))
            lastSent = Some(ts)
          case "suppressed" =>
            assert(lastSent.exists(ls => ts - ls < TtlUs),
              s"$k: suppressed at $ts with no sent within TTL before it")
        }
      }
    }
  }
}
