package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Streaming ETL into the warehouse: readStream → foreachBatch →
  * date-partitioned parquet store — events land incrementally in the
  * SAME layout the batch path writes, and a partition-filtered read
  * prunes. This is the continuous-ingestion shape of
  * `ReferencePipeline.writeStore` (micro-batch epochs instead of a
  * full rewrite).
  */
class StreamingEtlSpec extends SparkSpec {

  // ts physical type differs across testdata generations (NANOS-as-long
  // vs µs NTZ) — probe the footer like StreamingQueries.eventStream does.
  private def rawSchema(tsType: DataType) = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  test("q102: stream-built count-min sketch equals the batch build (merge-invariance)") {
    import spark.implicits._
    // batch-built sketch over the same keys the streaming query folds
    val keyed = graft.Tables.events(spark, sf)
      .withColumn("th", md5(to_binary(col("user_id").cast("string"), lit("utf-8"))))
      .select(
        conv(substring(col("th"), 1, 15), 16, 10).cast("long").as("h1"),
        conv(substring(col("th"), 16, 15), 16, 10).cast("long").bitwiseOR(1).as("h2"))
      .as[(Long, Long)]
    val batchSketch = keyed.groupByKey(_ => 0)
      .agg(graft.functions.CountMinAgg(3, 8).toColumn.name("cms"))
      .collect().head._2
    // the streamed report's est_cnt column is a pure function of the
    // streamed sketch; replaying the probe against the batch sketch
    // must reproduce it for every user
    val rows = graft.SparkEntry.queries("q102_stream_heavy_hitters")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val th = java.security.MessageDigest.getInstance("MD5")
        .digest(uid.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val p1 = java.lang.Long.parseLong(th.substring(0, 15), 16)
      val p2 = java.lang.Long.parseLong(th.substring(15, 30), 16) | 1L
      val est = (0 until 3).map { d =>
        batchSketch(d * 8 + java.lang.Math.floorMod(p1 + d * p2, 8L).toInt)
      }.min
      assert(r.getAs[Long]("est_cnt") == est,
        s"user $uid: streamed sketch diverged from the batch build")
      assert(r.getAs[Long]("overcount") >= 0L)
    }
  }

  test("foreachBatch streaming ETL writes the partitioned store incrementally") {
    val out = Files.createTempDirectory("graft_stream_store").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType

    val raw = spark.readStream
      .schema(rawSchema(tsType))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
    val stream = (if (tsType == LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw.withColumn("ts", col("ts").cast(TimestampType)))
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))

    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.repartition(col("day"))
          .write.mode("append").partitionBy("day").parquet(out)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()

    val store = spark.read.parquet(out)
    assert(store.count() == graft.Tables.events(spark, sf).count())
    // partition pruning reaches the file index
    val oneDay = store.filter(col("day") === "2024-01-02")
    assert(oneDay.count() ==
      graft.Tables.events(spark, sf)
        .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-02").count())
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), s"no pruning in:\n$plan")
  }

  test("exactly-once sink: forced batch replay after a crash neither dupes nor loses") {
    val src  = Files.createTempDirectory("graft_eo_src").toString
    val out  = Files.createTempDirectory("graft_eo_out").toString + "/store"
    val ctl  = Files.createTempDirectory("graft_eo_ctl").toString + "/store"
    val ckpt = Files.createTempDirectory("graft_eo_ckpt").toString

    val events = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"))
    def addFile(df: DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_eo_tmp").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      assert(part.renameTo(new java.io.File(s"$src/$name")))
    }
    addFile(events.filter(col("event_id") % 2 === 0), "a.parquet")

    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    def start() = spark.readStream.schema(schema).parquet(src)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ExactlyOnceSink.writeBatch(batch, batchId, out)
        // CONTROL: the naive at-least-once sink, same batches — proves
        // below that the replay really happened (it must duplicate)
        batch.write.mode("append").parquet(ctl)
        ()
      }
      .start()

    val q1 = start()
    q1.processAllAvailable()
    q1.stop()

    // crash simulation: batch 0's sink write completed but the commit
    // never reached the WAL — on restart Spark replays batch 0 with
    // the identical file list (pinned by offsets/0). The local FS
    // keeps a .crc shadow per file; it must go with the commit or the
    // checksummed rename of the REWRITTEN commit collides on it (a
    // local-FS artifact — HDFS has no client-side shadow files).
    assert(new java.io.File(s"$ckpt/commits/0").delete(), "no commit to delete")
    new java.io.File(s"$ckpt/commits/.0.crc").delete()
    addFile(events.filter(col("event_id") % 2 === 1), "b.parquet")
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val expected = events.count()
    val store = spark.read.parquet(out)
    assert(store.count() == expected, "exactly-once store lost or duplicated rows")
    assert(store.select("event_id").distinct().count() == expected)
    // the idempotent store carries both txn ids, none of them twice
    assert(store.select("batch_id").distinct().count() == 2)
    // sharpness: the control append sink MUST have duplicated batch 0 —
    // if not, the forced replay never happened and this test is vacuous
    val ctlCount = spark.read.parquet(ctl).count()
    val batch0 = events.filter(col("event_id") % 2 === 0).count()
    assert(ctlCount == expected + batch0,
      s"control sink has $ctlCount rows; expected ${expected + batch0} (replayed batch 0)")
  }
}
