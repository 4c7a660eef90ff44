package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata
  * (`/root/testdata/sf*`, see TESTDATA.md). One function per table so
  * query code reads declaratively; all reads are lazy scans — Catalyst
  * pushes filters/projections down into the parquet reader.
  *
  * RESOLVED-RELATION MEMO (round 17, guide §5/§7.3): every
  * `spark.read.parquet(path)` call pays ~100 ms of DRIVER-side
  * DataSource resolution — file listing (InMemoryFileIndex) plus
  * footer schema inference — before any task runs. The base tables
  * are immutable test fixtures read by every query, so that cost was
  * repeated per query PER REP (~1,900 resolutions in a full sweep).
  * The memo holds ONE resolved relation per (SparkSession, path):
  * pure METADATA reuse, the same thing Spark's session catalog does
  * for `spark.table(...)` and `filesourcePartitionFileCacheSize` does
  * for listings. No rows are cached — the DataFrame is a lazy plan
  * and every action recomputes from the parquet files.
  */
object Tables {
  private val relCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()
  private def perSession(spark: SparkSession) = relCache.synchronized {
    var m = relCache.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
      relCache.put(spark, m)
    }
    m
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    perSession(spark).computeIfAbsent(s"$dir/$name.parquet",
      p => spark.read.parquet(p))

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` has shipped as two physical shapes across testdata
    * generations, so the reader adapts on the footer schema:
    *
    *  - TIMESTAMP(NANOS): Spark's vectorized reader historically
    *    rejects it ([PARQUET_TYPE_ILLEGAL]); the legacy `nanosAsLong`
    *    session conf reads it as raw BIGINT nanos, which we
    *    floor-divide to microseconds with exact integer arithmetic
    *    (`div` — a double division would lose precision above 2^53
    *    ns). DuckDB's ns→µs handling floors the same way.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): reads natively as
    *    TIMESTAMP_NTZ; cast to the session type (LTZ) — value-
    *    preserving under the UTC session every entry point pins —
    *    so every downstream query keeps seeing plain TimestampType.
    *
    * The adapted frame is memoized like the raw tables (the conf is
    * consulted at RELATION-CREATION time, which happens once).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    perSession(spark).computeIfAbsent(s"$dir/events.parquet#adapted", { _ =>
      // No-op on builds whose reader handles NANOS natively; required
      // on builds where NANOS parquet is otherwise unreadable.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      import org.apache.spark.sql.functions.{col, expr}
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ =>
          raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      }
    })
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
