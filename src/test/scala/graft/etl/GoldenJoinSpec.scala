package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Star-join parity vs the reference's checked-in denormalized
  * extract (`dummy_ojol_transactions.csv`, 1,017 pre-joined rows —
  * SURVEY.md §2.3 calls it the golden output shape for the implied
  * joins): fact left-joined to user/driver/merchant/kategori must
  * reproduce the golden rows' dim attributes, including blank
  * merchant columns for empty-string FKs.
  */
class GoldenJoinSpec extends SparkSpec {

  private def res(name: String): String =
    getClass.getResource(s"/reference/$name").toString

  private lazy val denorm = {
    val fact = ReferencePipeline.cleanFact(spark.read.parquet(res("raw_fact.parquet")))
    ReferencePipeline.denormalize(
      fact,
      user = ReferencePipeline.dimPerson(spark.read.parquet(res("master_user.parquet"))),
      driver = ReferencePipeline.dimPerson(spark.read.parquet(res("master_driver.parquet"))),
      merchant = ReferencePipeline.dimMerchant(spark.read.parquet(res("master_merchant.parquet"))),
      kategori = ReferencePipeline.dimKategori(spark.read.parquet(res("master_kategori.parquet"))),
      kelurahan = ReferencePipeline.dimKelurahan(spark.read.parquet(res("master_kelurahan.parquet"))))
  }

  private lazy val golden = spark.read
    .option("header", "true").option("delimiter", ";")
    .csv(res("golden_denormalized.csv"))

  test("denormalized join reproduces the golden CSV's dim attributes") {
    val g = golden.select(
      col("id").cast("long").as("gid"),
      col("customer_name").as("g_cust"),
      col("customer_gender").as("g_cust_gender"),
      col("driver_name").as("g_drv"),
      col("kendaraan_jenis").as("g_fleet_type"),
      col("kendaraan_merk").as("g_fleet_merk"),
      col("merchant_name").as("g_mrc"),
      col("merchant_category").as("g_cat"),
      col("from_kelurahan").as("g_fromkel"),
      col("from_kecamatan").as("g_fromkec"),
      col("to_kelurahan").as("g_tokel"),
      col("to_kecamatan").as("g_tokec"))
    val mine = denorm.select(
      col("id"),
      col("cust_user_name"), col("cust_is_male"),
      col("drv_user_name"), col("drv_fleet_type"), col("drv_fleet_merk"),
      col("mrc_merchant_name"), col("cat_category_name"),
      col("fromkel_kelurahan_name"), col("fromkel_kecamatan_name"),
      col("tokel_kelurahan_name"), col("tokel_kecamatan_name"))
    val joined = mine.join(g, mine("id") === g("gid"))
    assert(joined.count() == golden.count(), "every golden row matches a fact id")
    // null-safe (<=>) comparisons: bare =!= is NULL when a side is
    // null and would silently drop the row from `bad` — a dim join
    // regressing to all-null would otherwise pass
    val bad = joined.filter(
      !(col("cust_user_name") <=> col("g_cust")) ||
      !(col("cust_is_male") <=> (col("g_cust_gender") === "L")) ||
      !(col("drv_user_name") <=> col("g_drv")) ||
      !(col("drv_fleet_type") <=> col("g_fleet_type")) ||
      !(col("drv_fleet_merk") <=> col("g_fleet_merk")) ||
      // merchant: golden blanks ⇔ null FK on our side
      !(col("mrc_merchant_name") <=> col("g_mrc")) ||
      (col("g_cat").isNotNull && !(col("cat_category_name") <=> col("g_cat"))) ||
      // the kelurahan×2 leg: both trip endpoints resolve to the
      // village/district names the golden extract carries
      !(col("fromkel_kelurahan_name") <=> col("g_fromkel")) ||
      !(col("fromkel_kecamatan_name") <=> col("g_fromkec")) ||
      !(col("tokel_kelurahan_name") <=> col("g_tokel")) ||
      !(col("tokel_kecamatan_name") <=> col("g_tokec")))
    val n = bad.count()
    if (n > 0) bad.select("id", "cust_user_name", "g_cust", "mrc_merchant_name", "g_mrc").show(5, false)
    assert(n == 0, s"$n rows diverge from the golden denormalized extract")
  }

  test("typed dims carry reference row counts and encodings") {
    val kat = ReferencePipeline.dimKategori(spark.read.parquet(res("master_kategori.parquet")))
    assert(kat.count() == 5)
    assert(kat.filter(col("category_is_food")).count() > 0)
    val drv = ReferencePipeline.dimPerson(spark.read.parquet(res("master_driver.parquet")))
    assert(drv.count() == 35)
    assert(drv.filter(col("is_male")).count() > 0 && drv.filter(!col("is_male")).count() > 0)
    val mrc = ReferencePipeline.dimMerchant(spark.read.parquet(res("master_merchant.parquet")))
    assert(mrc.count() == 84)
    // F2: no stringly ".0" suffixes survive
    assert(mrc.filter(col("kelurahan_id").contains(".")).count() == 0)
  }
}
