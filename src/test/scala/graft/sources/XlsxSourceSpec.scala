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

  test("parser handles inline strings, rich-text shared strings, and sparse rows") {
    // a synthetic workbook exercising OOXML paths the reference dims
    // don't: t="inlineStr" cells, <si> with multiple <t> runs
    // (rich text), and rows with missing cells
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx").toString
    val path = s"$dir/synthetic.xlsx"
    val shared =
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">
        |<si><t>col_a</t></si>
        |<si><r><t>rich </t></r><r><t>text</t></r></si>
        |</sst>""".stripMargin
    val sheet =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="inlineStr"><is><t>col_b</t></is></c><c r="C1" t="inlineStr"><is><t>col_c</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>42</v></c><c r="C2" t="inlineStr"><is><t>x</t></is></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>plain</t></is></c><c r="C3"><v>7.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val zout = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, body: String): Unit = {
      zout.putNextEntry(new ZipEntry(name))
      zout.write(body.getBytes("UTF-8")); zout.closeEntry()
    }
    put("xl/sharedStrings.xml", shared)
    put("xl/worksheets/sheet1.xml", sheet)
    zout.close()

    val df = spark.read.format("graft-xlsx").load(path)
    assert(df.columns.toSeq == Seq("col_a", "col_b", "col_c"))
    val rows = df.collect().map(r => (0 until 3).map(i => Option(r.getString(i))))
    assert(rows(0) == Seq(Some("rich text"), Some("42"), Some("x")),
      s"rich-text + numeric + inline row: ${rows(0)}")
    assert(rows(1) == Seq(Some("plain"), None, Some("7.5")),
      s"sparse row must null the missing cell: ${rows(1)}")
  }

  test("typed dim loaders accept the native read exactly like fixtures") {
    val kat = graft.etl.ReferencePipeline.dimKategori(native("master_kategori"))
    assert(kat.count() == 5)
    assert(kat.filter(col("category_is_food")).count() > 0)
    val kel = graft.etl.ReferencePipeline.dimKelurahan(native("master_kelurahan"))
    assert(kel.filter(col("kelurahan_id").isNull).count() == 0)
  }
}
