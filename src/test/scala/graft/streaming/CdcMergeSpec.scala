package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q188 CDC merge: the snapshot chain's correctness must be
  * independent of how the stream splits into micro-batches — counts
  * add and "latest" is a struct max, both associative, so a forced
  * two-batch replay must produce the identical final table.
  */
class CdcMergeSpec extends SparkSpec {

  test("versioned merge over a forced multi-batch replay equals the one-shot run") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val cut = ev.agg(expr("percentile_approx(event_id, 0.5)")).collect()(0).getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("graft_q188_batches").toString
    ev.filter(col("event_id") <= cut).coalesce(1).write.parquet(s"$dir/b0")
    ev.filter(col("event_id") > cut).coalesce(1).write.parquet(s"$dir/b1")
    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/b*")
    val multi = StreamingQueries.cdcMerge(spark, stream)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    scala.util.Try(
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir)))
    val oneShot = SparkEntry.queries("q188_stream_cdc_merge")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(multi == oneShot, "micro-batch split must not change the merged table")
    assert(multi.nonEmpty)
  }

  test("merged table agrees with a batch latest-row-wins recompute") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val batch = graft.Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("n"), col("event_type"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val merged = SparkEntry.queries("q188_stream_cdc_merge")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(merged == batch)
  }
}
