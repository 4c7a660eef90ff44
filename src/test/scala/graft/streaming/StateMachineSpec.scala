package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Proves q139's `flatMapGroupsWithState` state actually PERSISTS and
  * composes across micro-batches — the property the single-batch
  * oracle gate can't see: the same event history split into two
  * time-ordered files and replayed one file per trigger must land on
  * exactly the per-user states the one-batch replay produces.
  */
class StateMachineSpec extends SparkSpec {

  test("per-user state composes across micro-batches (1 file per trigger)") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        (col("event_type") === "purchase").cast("int").as("is_purchase"))
    val cut = ev.agg(expr("percentile_approx(ts_us, 0.5)")).collect()(0).getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_q139_batches").toString
    // two time-ordered files: the file source lists in discovery order,
    // so the earlier half lands (and is processed) first
    ev.filter(col("ts_us") <= cut).coalesce(1).write.parquet(s"$dir/b0")
    ev.filter(col("ts_us") > cut).coalesce(1).write.parquet(s"$dir/b1")
    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/b*")
      .as[UserEvent]
    val q = StreamingQueries.userStateMachine(stream).writeStream
      .outputMode("update").format("memory").queryName("q139_two_batch").start()
    q.processAllAvailable()
    val nBatches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    // the memory sink holds the rows; the replay files are done with
    scala.util.Try(
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir)))
    assert(nBatches >= 2, s"expected a multi-batch replay, got $nBatches batches")
    val twoBatch = StreamingQueries.latestStatePerUser(spark.table("q139_two_batch"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val oneBatch = SparkEntry.queries("q139_user_state_machine")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(twoBatch == oneBatch,
      "multi-batch state fold must equal the single-batch replay")
    scala.util.Try(org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir)))
  }
}
