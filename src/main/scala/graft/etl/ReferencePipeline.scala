package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's EP1 ETL (reference `server.py:17-130`) as ONE lazy
  * DataFrame DAG: raw stringly-typed fact rows → cleaned/typed/derived
  * fact → (optionally) a quarter/mode-partitioned parquet store.
  *
  * Where the reference mutates a pandas frame statement-by-statement
  * (eager, row-UDFs, double parsing work for lat/lng), this is a
  * single projection Catalyst can pipeline into one codegen stage —
  * and the partitioned write replaces the dict-of-DataFrames +
  * SQLite-table-family materialization (`server.py:101-130`).
  */
object ReferencePipeline {

  /** Raw fact schema: every column TEXT, exactly as the reference's
    * SQLite source delivers it (`server.py:53-56`, FIXTURES.md A1).
    */
  val rawFactColumns: Seq[String] = Seq(
    "id", "date_process", "mode", "from_alamat", "from_kelurahanid",
    "transaction_from_latlng", "to_alamat", "to_kelurahanid",
    "transaction_to_latlng", "distance", "amount_delivery",
    "amount_merchant", "transaction_amount_total", "customer_id",
    "driver_id", "merchant_id")

  import CleanExprs._

  /** The full cleaning/derivation projection (reference
    * `server.py:59-98`): date split (F4/F5/F10), kelurahan id repair
    * (F1), lat/lng repair (F7/F8 — note the reference parses each
    * string twice; here it is one projection), distance truncation
    * (F6), duration (F9), quarter key (F11), typed amounts; raw
    * intermediate columns dropped at the end like `server.py:96-98`.
    */
  def cleanFact(raw: DataFrame): DataFrame = {
    val dp = col("date_process")
    raw
      .withColumn("id", removeAfterDot(col("id")).cast("long"))
      .withColumn("date_start", dateProcessStart(dp))
      .withColumn("date_end", dateProcessEnd(dp))
      .withColumn("from_kelurahanid", sciNotationIdToLong(col("from_kelurahanid")))
      .withColumn("to_kelurahanid", sciNotationIdToLong(col("to_kelurahanid")))
      .withColumn("transaction_from_lat", latOf(col("transaction_from_latlng")))
      .withColumn("transaction_from_lng", lngOf(col("transaction_from_latlng")))
      .withColumn("transaction_to_lat", latOf(col("transaction_to_latlng")))
      .withColumn("transaction_to_lng", lngOf(col("transaction_to_latlng")))
      .withColumn("distance", col("distance").cast("double"))
      .withColumn("distance_rounded", roundedDist(col("distance")))
      .withColumn("duration", durationMinutes(col("date_start"), col("date_end")))
      .withColumn("amount_delivery", col("amount_delivery").cast("double"))
      .withColumn("amount_merchant", col("amount_merchant").cast("double"))
      .withColumn("transaction_amount_total", col("transaction_amount_total").cast("double"))
      .withColumn("merchant_id",
        when(col("merchant_id") === "", lit(null))
          .otherwise(removeAfterDot(col("merchant_id"))).cast("long"))
      .withColumn("customer_id", removeAfterDot(col("customer_id")).cast("long"))
      .withColumn("driver_id", removeAfterDot(col("driver_id")).cast("long"))
      .withColumn("quarter", quarterKey(col("date_start")))
      .drop("date_process", "transaction_from_latlng", "transaction_to_latlng")
  }

  /** Typed dimension loads (reference `server.py:26-50`): the raw
    * stringly Excel rows (extracted to parquet fixtures) repaired and
    * typed exactly as the reference does — F13 bool encodings
    * (`category_is_food == 1`, `is_male = gender == 'L'`), F2
    * merchant kelurahan-id repair, numeric casts.
    */
  def dimKategori(raw: DataFrame): DataFrame = raw.select(
    col("category_id").cast("long").as("category_id"),
    col("category_name"),
    boolFromInt(col("category_is_food").cast("int")).as("category_is_food"))

  def dimPerson(raw: DataFrame): DataFrame = {
    val base = raw
      .withColumn("user_id", col("user_id").cast("long"))
      .withColumn("is_male", isMale(col("user_gender"))).drop("user_gender")
      .withColumn("user_lat", col("user_lat").cast("double"))
      .withColumn("user_lng", col("user_lng").cast("double"))
      .withColumn("kelurahan_id", col("kelurahan_id").cast("long"))
    if (base.columns.contains("fleet_id"))
      base.withColumn("fleet_id", col("fleet_id").cast("long"))
    else base
  }

  /** Kelurahan (village) dimension (reference `server.py:38-39`):
    * typed id; name/kecamatan kept verbatim. Joined TWICE in the
    * star (from/to legs — golden CSV columns `from_kelurahan`,
    * `from_kecamatan`, `to_kelurahan`, `to_kecamatan`).
    */
  def dimKelurahan(raw: DataFrame): DataFrame = raw
    .withColumn("kelurahan_id", col("kelurahan_id").cast("long"))

  def dimMerchant(raw: DataFrame): DataFrame = raw
    .withColumn("merchant_id", col("merchant_id").cast("long"))
    .withColumn("category_id", col("category_id").cast("long"))
    .withColumn("merchant_address_lat", col("merchant_address_lat").cast("double"))
    .withColumn("merchant_address_lng", col("merchant_address_lng").cast("double"))
    // reference keeps this FK stringly, "123.0" → "123" (server.py:41-44)
    .withColumn("kelurahan_id", removeAfterDot(col("kelurahan_id")))

  /** The star join the reference implies but never executes
    * (SURVEY.md §2.3): fact LEFT-joins every dim on its FK — left, not
    * inner, so empty merchant FKs keep blank merchant columns, exactly
    * like the golden denormalized CSV. Dims are broadcast (hundreds of
    * rows; on a cluster they'd be broadcast regardless of SF because
    * dimensions grow sub-linearly).
    */
  def denormalize(
      fact: DataFrame,
      user: DataFrame,
      driver: DataFrame,
      merchant: DataFrame,
      kategori: DataFrame,
      kelurahan: DataFrame): DataFrame = {
    def prefixed(df: DataFrame, p: String): DataFrame =
      df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$p$c"))
    fact
      .join(broadcast(prefixed(user, "cust_")),
        fact("customer_id") === col("cust_user_id"), "left")
      .join(broadcast(prefixed(driver, "drv_")),
        fact("driver_id") === col("drv_user_id"), "left")
      .join(broadcast(prefixed(merchant, "mrc_")),
        fact("merchant_id") === col("mrc_merchant_id"), "left")
      .join(broadcast(prefixed(kategori, "cat_")),
        col("mrc_category_id") === col("cat_category_id"), "left")
      // the kelurahan dim joins TWICE — once per trip endpoint
      // (golden CSV from_kelurahan/from_kecamatan + to_* columns)
      .join(broadcast(prefixed(kelurahan, "fromkel_")),
        fact("from_kelurahanid") === col("fromkel_kelurahan_id"), "left")
      .join(broadcast(prefixed(kelurahan, "tokel_")),
        fact("to_kelurahanid") === col("tokel_kelurahan_id"), "left")
  }

  /** The reference's two partition layouts (`server.py:101-112`) as
    * partitioned parquet writes — `QUART_*`/`MODE_*` SQLite tables
    * become partition directories, and reads with a quarter/mode
    * filter prune to one directory (Catalyst
    * `PruneFileSourcePartitions`, replacing the manual dict lookup).
    */
  def writeStore(fact: DataFrame, path: String): Unit = {
    // repartition on the partition column first: without it every task
    // writes a sliver into every partition directory — at cluster
    // scale that's numTasks × numPartitions small files; with it each
    // partition's rows are co-located before the write
    fact.repartition(col("quarter"))
      .write.mode("overwrite").partitionBy("quarter").parquet(s"$path/by_quarter")
    fact.repartition(col("mode"))
      .write.mode("overwrite").partitionBy("mode").parquet(s"$path/by_mode")
  }

  /** EP2/EP3's per-partition dashboard aggregates (reference
    * `server.py:152-299`) against the partitioned store: partition
    * prune → per-chart aggregates. Returns the chart name → DataFrame
    * map; each histogram ships ≤11 rows to the caller instead of the
    * reference's full-column `to_list()` collect.
    */
  def quarterlyDashboard(store: DataFrame, quarter: String): Map[String, DataFrame] = {
    val part = store.filter(col("quarter") === quarter)
    Map(
      "amount_delivery_hist" -> numericHistogram(part, col("amount_delivery")),
      "mode_freq"            -> part.groupBy(col("mode")).agg(count(lit(1)).as("n")).orderBy("mode"),
      "distance_hist"        -> part.groupBy(col("distance_rounded")).agg(count(lit(1)).as("n")).orderBy("distance_rounded"),
      "duration_hist"        -> numericHistogram(part, col("duration")),
      "geo_from"             -> part.select(col("transaction_from_lat"), col("transaction_from_lng"), col("mode")),
      "table"                -> part,
    )
  }

  /** EP3 — the per-mode dashboard (reference `server.py:223-299`):
    * same shape as EP2 keyed on mode, with the mode-frequency chart
    * swapped for start/end hour-of-day histograms (F12,
    * `server.py:253,261`).
    */
  def modeDashboard(store: DataFrame, mode: String): Map[String, DataFrame] = {
    val part = store.filter(col("mode") === mode)
    Map(
      "amount_delivery_hist" -> numericHistogram(part, col("amount_delivery")),
      "start_hour_hist"      -> part.groupBy(hour(col("date_start")).as("h")).agg(count(lit(1)).as("n")).orderBy("h"),
      "end_hour_hist"        -> part.groupBy(hour(col("date_end")).as("h")).agg(count(lit(1)).as("n")).orderBy("h"),
      "distance_hist"        -> part.groupBy(col("distance_rounded")).agg(count(lit(1)).as("n")).orderBy("distance_rounded"),
      "duration_hist"        -> numericHistogram(part, col("duration")),
      "geo_from"             -> part.select(col("transaction_from_lat"), col("transaction_from_lng"), col("quarter")),
      "table"                -> part,
    )
  }

  /** matplotlib-parity 10-bin histogram (SURVEY.md §2 A2/A3): edges =
    * linspace(min, max, 11), right-closed last bin; the min/max pass
    * is a 1-row broadcast cross join, not a driver collect.
    */
  def numericHistogram(df: DataFrame, c: Column, bins: Int = 10): DataFrame = {
    val mm = df.agg(min(c).as("mn"), max(c).as("mx"))
    df.crossJoin(broadcast(mm))
      .withColumn("bin",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(floor((c - col("mn")) * bins / (col("mx") - col("mn"))), lit(bins - 1L)))
          .cast("int"))
      .groupBy("bin").agg(count(lit(1)).as("n")).orderBy("bin")
  }
}
