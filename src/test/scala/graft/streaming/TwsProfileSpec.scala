package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves q163's transformWithState state actually CARRIES across
  * micro-batches (the single-batch oracle gate can't see that):
  * replayed in two batches, each user's LAST emission must equal the
  * whole-history profile — counts, cents, MapState per-type counts
  * and the tie-broken top type all composed across the batch
  * boundary.
  */
class TwsProfileSpec extends SparkSpec {

  test("two-batch replay: final per-user emission equals whole-history profile") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("cents"),
        col("event_id"))
    val dir = java.nio.file.Files.createTempDirectory("graft_q163_batches").toString
    ev.filter(col("event_id") % 2 === 0).drop("event_id")
      .coalesce(1).write.parquet(s"$dir/b0")
    ev.filter(col("event_id") % 2 === 1).drop("event_id")
      .coalesce(1).write.parquet(s"$dir/b1")

    val stream = spark.readStream
      .schema("user_id LONG, event_type STRING, cents LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/b*")
      .as[TwsEvent]
    val out = StreamingQueries.transformedProfiles(stream)
    val buf = new scala.collection.mutable.ArrayBuffer[(Long, TwsProfileRow)]()
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = out.writeStream
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[TwsProfileRow], id: Long) =>
        df.collect().foreach(r => buf.synchronized { buf += ((id, r)) })
        ()
      }
      .start()
    q.processAllAvailable()
    val nBatches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    scala.util.Try(
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir)))
    assert(nBatches >= 2, s"expected a two-batch replay, got $nBatches batches")

    val lastPerUser = buf.groupBy(_._2.user_id).view
      .mapValues(rs => rs.maxBy(_._1)._2).toMap

    val expect = ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("cents"))
      .collect()
      .groupBy(_.getLong(0)).map { case (uid, rows) =>
        val byType = rows.map(r => r.getString(1) -> (r.getLong(2), r.getLong(3)))
        val (topT, (topN, _)) = byType.minBy { case (t, (c, _)) => (-c, t) }
        uid -> TwsProfileRow(uid,
          byType.map(_._2._1).sum, byType.size, byType.map(_._2._2).sum, topT, topN)
      }
    assert(lastPerUser == expect,
      s"state did not compose across batches: ${lastPerUser.toSeq.diff(expect.toSeq)}")
  }
}
