package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata
  * (`/root/testdata/sf*`, see TESTDATA.md). One function per table so
  * query code reads declaratively; all reads are lazy scans — Catalyst
  * pushes filters/projections down into the parquet reader.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // No-op on builds whose reader handles NANOS natively; required
    // on builds where NANOS parquet is otherwise unreadable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    import org.apache.spark.sql.functions.{col, expr}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
