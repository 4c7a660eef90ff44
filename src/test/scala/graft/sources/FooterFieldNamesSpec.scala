package graft.sources

/** Focused test for the round-16 change-feed fix: the name-dialect
  * probe reads parquet footers with parquet-mr directly
  * ([[DataFile.footerFieldNames]]) instead of a per-file
  * `spark.read.parquet` DataSource resolution (~100 ms of driver work
  * per changed file — it doubled the whole feed computation). The
  * helper must surface exactly the written field names for BOTH
  * dialects the feed groups by: legacy positional c0..cN and the
  * round-15 real-name shape, at any arity.
  */
class FooterFieldNamesSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def write(names: Seq[String], types: Seq[Char]): String = {
    val dir = java.nio.file.Files.createTempDirectory("footer_names").toFile
    dir.deleteOnExit()
    val p = new java.io.File(dir, "f.parquet").getAbsolutePath
    val w = new DataFile.Writer(p, names, types)
    try w.write(Array[Any](java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L),
      "x", java.lang.Long.valueOf(3L), java.lang.Long.valueOf(4L)))
    finally w.close()
    p
  }

  test("legacy positional dialect") {
    val names = (0 until 5).map("c" + _)
    val types = Seq('L', 'L', 'S', 'L', 'L')
    assert(DataFile.footerFieldNames(write(names, types)) == names)
  }

  test("real-name dialect with a typed extra") {
    val names = Seq("ok", "ship_us", "flag", "qty", "price_cents", "text")
    val types = Seq('L', 'L', 'S', 'L', 'L', 'S')
    assert(DataFile.footerFieldNames(write(names, types)) == names)
  }
}
