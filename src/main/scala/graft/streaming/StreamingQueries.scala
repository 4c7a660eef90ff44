package graft.streaming

import graft.QuerySpec
import graft.etl.CleanExprs.{moneySum, moneySumSql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table (SURVEY.md §2.7 — the
  * reference is batch-only; this is the §7-step-8 extension mapping
  * the quarter/mode dashboards onto event-time windows).
  *
  * The driver contract wants a batch `DataFrame` back, so each query
  * replays the events parquet as a file stream into a memory sink,
  * drains it synchronously (`processAllAvailable`), and returns the
  * sink table — real streaming execution (incremental state store,
  * event-time windows, watermarks), deterministic batch result.
  */
object StreamingQueries {

  /** events.parquet carries TIMESTAMP(NANOS) → must be read as long
    * nanos (same trick as [[graft.Tables.events]], but readStream
    * needs the schema up front).
    */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  private def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The file-stream source requires a directory path; events.parquet
    // is a single file, so stream the directory with a name filter.
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Drain a streaming aggregate into a uniquely-named memory sink and
    * return it as a batch DataFrame.
    */
  private var sinkCounter = 0
  private def drain(spark: SparkSession, agg: DataFrame, mode: String): DataFrame = {
    val name = synchronized { sinkCounter += 1; s"graft_sink_$sinkCounter" }
    val q = agg.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** q60 — tumbling daily windows per event type (complete mode: the
    * whole history replays in one batch, and complete emits every
    * window without waiting on the watermark).
    */
  private def q60(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total_value"))
    drain(spark, agg, "complete")
      .select(col("window.start").as("day"), col("event_type"), col("n"), col("total_value"))
      .orderBy("day", "event_type")
  }

  private val q60Sql =
    s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       |       COUNT(*) AS n, ${moneySumSql("value")} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /** q61 — sliding windows (6h slide over 24h width) per event type:
    * each event lands in 4 windows — the streaming-state shape the
    * tumbling case doesn't exercise. Oracle: a generate_series
    * unnest reproduces window assignment relationally.
    */
  private def q61(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day", "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    drain(spark, agg, "complete")
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
      .orderBy("win_start", "event_type")
  }

  private val q61Sql =
    """WITH wins AS (
      |  SELECT event_type,
      |         CAST(date_trunc('day', ts) AS TIMESTAMP)
      |           + to_hours(6 * CAST(floor(date_diff('hour', CAST(date_trunc('day', ts) AS TIMESTAMP), CAST(ts AS TIMESTAMP)) / 6.0) AS BIGINT))
      |           - to_hours(6 * s.i) AS win_start
      |  FROM events, (SELECT unnest(range(0, 4)) AS i) s),
      |valid AS (SELECT event_type, win_start FROM wins)
      |SELECT win_start, event_type, COUNT(*) AS n
      |FROM valid GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q60_stream_daily",   q60, Some(q60Sql), headline = true),
    QuerySpec("q61_stream_sliding", q61, Some(q61Sql)),
  )
}
