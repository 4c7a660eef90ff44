package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE parity test: graft's ETL over the reference's real raw OLTP
  * fact table (1,878 dirty SQLite rows, extracted verbatim to parquet
  * by tools/extract_reference_fixtures.py) must reproduce the
  * reference's own materialized outputs (the QUART and MODE partition
  * tables of `output.db` — the golden artifacts the reference
  * checked in).
  *
  * Column-type notes: the reference leaves `id`/amount/distance
  * columns as TEXT in its store; graft types them (long/double) —
  * so the comparison casts golden TEXT to graft's types. Everything
  * the reference DERIVED (dates, kelurahan ids, lat/lng, rounded
  * distance, duration) is compared value-by-value.
  */
class GoldenPipelineSpec extends SparkSpec {

  private def res(name: String): String =
    getClass.getResource(s"/reference/$name").toString

  private lazy val cleaned: DataFrame =
    ReferencePipeline.cleanFact(spark.read.parquet(res("raw_fact.parquet")))

  private def golden(table: String): DataFrame =
    spark.read.parquet(res(s"golden_$table.parquet"))

  test("partition row counts match the reference store exactly") {
    val byQuarter = cleaned.groupBy("quarter").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byQuarter == Map("2018Q3" -> 205L, "2018Q4" -> 1113L, "2019Q1" -> 560L))
    val byMode = cleaned.groupBy("mode").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byMode == Map("BIKE" -> 594L, "CAR" -> 337L, "FOOD" -> 506L, "SHOP" -> 441L))
  }

  private def compareMode(mode: String): Unit = {
    val g = golden(s"MODE_$mode").select(
      col("id").cast("double").cast("long").as("id"),
      col("from_kelurahanid").as("g_from_kel"),
      col("to_kelurahanid").as("g_to_kel"),
      to_timestamp(col("date_start")).as("g_start"),
      to_timestamp(col("date_end")).as("g_end"),
      col("transaction_from_lat").as("g_lat"),
      col("transaction_from_lng").as("g_lng"),
      col("transaction_to_lat").as("g_tlat"),
      col("transaction_to_lng").as("g_tlng"),
      col("distance_rounded").cast("int").as("g_dist"),
      col("duration").cast("int").as("g_dur"),
      when(col("merchant_id") === "", lit(null))
        .otherwise(col("merchant_id").cast("double").cast("long")).as("g_merchant"))
    val mine = cleaned.filter(col("mode") === mode)
    assert(mine.count() == g.count(), s"row count $mode")
    val joined = mine.join(g, "id")
    assert(joined.count() == g.count(), s"id join $mode")
    // null-safe comparisons throughout: a bare =!= (or abs-diff) is
    // NULL when either side is null and would silently DROP the row
    // from `bad` — a repair expression regressing to all-null would
    // otherwise pass this test
    def neq(a: String, b: String) = !(col(a) <=> col(b))
    def fneq(a: String, b: String) =
      (col(a).isNull =!= col(b).isNull) ||
        (col(a).isNotNull && abs(col(a) - col(b)) > 1e-9)
    val bad = joined.filter(
      neq("from_kelurahanid", "g_from_kel") ||
      neq("to_kelurahanid", "g_to_kel") ||
      neq("date_start", "g_start") ||
      neq("date_end", "g_end") ||
      fneq("transaction_from_lat", "g_lat") ||
      fneq("transaction_from_lng", "g_lng") ||
      fneq("transaction_to_lat", "g_tlat") ||
      fneq("transaction_to_lng", "g_tlng") ||
      neq("distance_rounded", "g_dist") ||
      neq("duration", "g_dur") ||
      neq("merchant_id", "g_merchant"))
    val n = bad.count()
    if (n > 0) bad.select("id").show(5)
    assert(n == 0, s"$n mismatching rows in MODE_$mode")
  }

  test("MODE_BIKE reproduces the reference's golden partition value-by-value") {
    compareMode("BIKE")
  }
  test("MODE_CAR golden parity") { compareMode("CAR") }
  test("MODE_FOOD golden parity (incl. merchant FKs)") { compareMode("FOOD") }
  test("MODE_SHOP golden parity") { compareMode("SHOP") }

  test("QUART partitions carry the same ids as the reference's") {
    Seq("2018Q3", "2018Q4", "2019Q1").foreach { q =>
      val gIds = golden(s"QUART_$q").select(col("id").cast("double").cast("long"))
        .collect().map(_.getLong(0)).toSet
      val myIds = cleaned.filter(col("quarter") === q).select("id")
        .collect().map(_.getLong(0)).toSet
      assert(myIds == gIds, s"id set mismatch for $q")
    }
  }
}
