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

  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  test("foreachBatch streaming ETL writes the partitioned store incrementally") {
    val out = Files.createTempDirectory("graft_stream_store").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val stream = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
}
