package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S1 native-source parity: `spark.read.format("graft-xlsx")` over the
  * reference's five master_*.xlsx workbooks must equal the golden
  * parquet fixtures (extracted cell-for-cell by
  * tools/extract_dim_fixtures.py) — same columns, same rows, nulls
  * included. Passing this upgrades SURVEY §2.1 S1 from
  * fixture-extraction to a native Spark read path.
  */
class XlsxSourceSpec extends SparkSpec {

  private val dims = Seq("master_kategori", "master_driver",
    "master_kelurahan", "master_merchant", "master_user")

  private def fixture(name: String): DataFrame =
    spark.read.parquet(getClass.getResource(s"/reference/$name.parquet").toString)

  private def native(name: String): DataFrame =
    spark.read.format("graft-xlsx")
      .load(s"/root/reference/assets/oltp/$name.xlsx")

  test("native xlsx reads equal the parquet fixtures row-for-row") {
    dims.foreach { name =>
      val n = native(name)
      val f = fixture(name)
      assert(n.columns.toSeq == f.columns.toSeq, s"$name: column mismatch")
      assert(n.schema.fields.forall(_.dataType.typeName == "string"),
        s"$name: raw xlsx cells must be strings")
      // exceptAll both ways = exact multiset equality (null-safe)
      val missing = f.exceptAll(n).count()
      val extra = n.exceptAll(f).count()
      assert(missing == 0 && extra == 0,
        s"$name: $missing fixture rows missing, $extra extra rows")
      assert(n.count() == f.count(), s"$name: row count")
    }
  }

  test("short name resolves through the DataSource registry") {
    // the META-INF/services registration, not the class name, is what
    // a library user types
    val viaShortName = spark.read.format("graft-xlsx")
      .load("/root/reference/assets/oltp/master_kategori.xlsx")
    assert(viaShortName.count() == 5)
  }

  test("typed dim loaders accept the native read exactly like fixtures") {
    val kat = graft.etl.ReferencePipeline.dimKategori(native("master_kategori"))
    assert(kat.count() == 5)
    assert(kat.filter(col("category_is_food")).count() > 0)
    val kel = graft.etl.ReferencePipeline.dimKelurahan(native("master_kelurahan"))
    assert(kel.filter(col("kelurahan_id").isNull).count() == 0)
  }
}
