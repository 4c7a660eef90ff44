package graft.sources

/** The columnar data plane's row contract: parquet round-trip with
  * nulls, projection (only wanted positions populate), arity padding
  * for pre-evolution files, typed (DOUBLE/STRING) extras under real
  * column names, the legacy positional-name fallback, and the legacy
  * CSV dialect through the same cursor API.
  */
class DataFileSpec extends graft.SparkSpec {
  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("datafile").toFile
    d.deleteOnExit(); d
  }

  // legacy shape helpers: positional c0..cN names, L-except-c2 types
  private def cNames(n: Int): Seq[String] = (0 until n).map("c" + _)
  private def defTypes(n: Int): Seq[Char] =
    (0 until n).map(i => if (i == 2) 'S' else 'L')

  private def row(ok: Long, us: Long, flag: String, qty: Long, pc: Long,
      extras: Any*): Array[Any] =
    (Array[Any](ok, us, flag, qty, pc) ++ extras).map {
      case null => null
      case s: String => s
      case l: Long => java.lang.Long.valueOf(l)
      case l: java.lang.Long => l
      case d: Double => java.lang.Double.valueOf(d)
      case x: Int => java.lang.Long.valueOf(x.toLong)
      case other => other
    }

  test("parquet round-trip with extras and nulls") {
    val d = tmpDir()
    val w = DataFile.writer(d.getPath, "part-t1.parquet", cNames(7), defTypes(7))
    w.write(row(1L, 100L, "A", 2L, 30L, 7L, null))
    w.write(row(2L, 200L, "B", 3L, 40L, null, 9L))
    w.close()
    val c = DataFile.openRows(new java.io.File(d, "part-t1.parquet").getPath,
      7, DataFile.allCols(7), cNames(7))
    assert(c.next())
    assert(c.get().toSeq == Seq(1L, 100L, "A", 2L, 30L, 7L, null))
    assert(c.next())
    assert(c.get().toSeq == Seq(2L, 200L, "B", 3L, 40L, null, 9L))
    assert(!c.next())
    c.close()
  }

  test("projection populates only wanted positions (columnar pruning)") {
    val d = tmpDir()
    val w = DataFile.writer(d.getPath, "part-t2.parquet", cNames(5), defTypes(5))
    w.writeBase(5L, 500L, "X", 6L, 70L)
    w.close()
    val c = DataFile.openRows(new java.io.File(d, "part-t2.parquet").getPath,
      5, Array(1, 3), cNames(5))
    assert(c.next())
    assert(c.get().toSeq == Seq(null, 500L, null, 6L, null))
    c.close()
  }

  test("pre-evolution file pads missing trailing columns with null") {
    val d = tmpDir()
    val w = DataFile.writer(d.getPath, "part-t3.parquet", cNames(5), defTypes(5))
    w.writeBase(9L, 900L, "Y", 1L, 2L)
    w.close()
    // read at the EVOLVED arity (7): the file has no c5/c6
    val c = DataFile.openRows(new java.io.File(d, "part-t3.parquet").getPath,
      7, DataFile.allCols(7), cNames(7))
    assert(c.next())
    assert(c.get().toSeq == Seq(9L, 900L, "Y", 1L, 2L, null, null))
    c.close()
  }

  test("writer pads short rows to the declared arity") {
    val d = tmpDir()
    val w = DataFile.writer(d.getPath, "part-t4.parquet", cNames(7), defTypes(7))
    w.write(row(1L, 10L, "Z", 2L, 3L)) // 5-long row into a 7-col file
    w.close()
    val c = DataFile.openRows(new java.io.File(d, "part-t4.parquet").getPath,
      7, DataFile.allCols(7), cNames(7))
    assert(c.next())
    assert(c.get().toSeq == Seq(1L, 10L, "Z", 2L, 3L, null, null))
    c.close()
  }

  test("legacy CSV dialect reads through the same cursor") {
    val d = tmpDir()
    val pw = new java.io.PrintWriter(new java.io.File(d, "part-t5.csv"), "UTF-8")
    try { pw.println("1,100,A,2,30,7"); pw.println("2,200,B,3,40,") }
    finally pw.close()
    val c = DataFile.openRows(new java.io.File(d, "part-t5.csv").getPath,
      6, DataFile.allCols(6), cNames(6))
    assert(c.next())
    assert(c.get().toSeq == Seq(1L, 100L, "A", 2L, 30L, 7L))
    assert(c.next())
    assert(c.get().toSeq == Seq(2L, 200L, "B", 3L, 40L, null))
    assert(!c.next())
    c.close()
  }

  test("typed named schema: DOUBLE and STRING extras round-trip under real names") {
    val d = tmpDir()
    val names = Seq("ok", "ship_us", "flag", "qty", "price_cents", "score", "tag")
    val types = Seq('L', 'L', 'S', 'L', 'L', 'D', 'S')
    val w = DataFile.writer(d.getPath, "part-t7.parquet", names, types)
    w.write(row(1L, 100L, "A", 2L, 30L, 0.75, "hot"))
    w.write(row(2L, 200L, "B", 3L, 40L, null, null))
    w.close()
    val c = DataFile.openRows(new java.io.File(d, "part-t7.parquet").getPath,
      7, DataFile.allCols(7), names)
    assert(c.next())
    assert(c.get().toSeq == Seq(1L, 100L, "A", 2L, 30L, 0.75, "hot"))
    assert(c.next())
    assert(c.get().toSeq == Seq(2L, 200L, "B", 3L, 40L, null, null))
    c.close()
    // spark reads the REAL column names and types natively
    val df = spark.read.parquet(new java.io.File(d, "part-t7.parquet").getPath)
    assert(df.columns.toSeq == names)
    assert(df.schema("score").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(df.schema("tag").dataType == org.apache.spark.sql.types.StringType)
  }

  test("mixed generations: legacy positional file reads under real names") {
    val d = tmpDir()
    // old file written with positional names
    val wOld = DataFile.writer(d.getPath, "part-old.parquet", cNames(5), defTypes(5))
    wOld.writeBase(1L, 100L, "A", 2L, 30L)
    wOld.close()
    // read at the typed-named snapshot shape (same positions)
    val names = Seq("ok", "ship_us", "flag", "qty", "price_cents", "score")
    val c = DataFile.openRows(new java.io.File(d, "part-old.parquet").getPath,
      6, DataFile.allCols(6), names)
    assert(c.next())
    assert(c.get().toSeq == Seq(1L, 100L, "A", 2L, 30L, null))
    c.close()
  }

  test("spark reads our parquet data files natively (legacy positional names)") {
    val d = tmpDir()
    val w = DataFile.writer(d.getPath, "part-t6.parquet", cNames(5), defTypes(5))
    w.writeBase(1L, 100L, "A", 2L, 30L)
    w.writeBase(2L, 200L, "B", 3L, 40L)
    w.close()
    val df = spark.read.parquet(new java.io.File(d, "part-t6.parquet").getPath)
    assert(df.columns.toSeq == Seq("c0", "c1", "c2", "c3", "c4"))
    assert(df.count() == 2L)
  }
}
