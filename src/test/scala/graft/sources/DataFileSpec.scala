package graft.sources



/** The columnar data plane's row contract: parquet round-trip with
  * nulls, projection (only wanted positions populate), arity padding
  * for pre-evolution files, and the legacy CSV dialect through the
  * same cursor API.
  */
class DataFileSpec extends graft.SparkSpec {
  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("datafile").toFile
    d.deleteOnExit(); d
  }

  private def row(ok: Long, us: Long, flag: String, qty: Long, pc: Long,
      extras: Any*): Array[Any] =
    (Array[Any](ok, us, flag, qty, pc) ++ extras).map {
      case null => null
      case s: String => s
      case l: Long => java.lang.Long.valueOf(l)
      case l: java.lang.Long => l
      case x: Int => java.lang.Long.valueOf(x.toLong)
      case other => other
    }

  test("parquet round-trip with extras and nulls") {
    val d = tmpDir()
    val w = DataFile.writer(d.getPath, "part-t1.parquet", 7)
    w.write(row(1L, 100L, "A", 2L, 30L, 7L, null))
    w.write(row(2L, 200L, "B", 3L, 40L, null, 9L))
    w.close()
    val c = DataFile.openRows(new java.io.File(d, "part-t1.parquet").getPath,
      7, DataFile.allCols(7))
    assert(c.next())
    assert(c.get().toSeq == Seq(1L, 100L, "A", 2L, 30L, 7L, null))
    assert(c.next())
    assert(c.get().toSeq == Seq(2L, 200L, "B", 3L, 40L, null, 9L))
    assert(!c.next())
    c.close()
  }

  test("projection populates only wanted positions (columnar pruning)") {
    val d = tmpDir()
    val w = DataFile.writer(d.getPath, "part-t2.parquet", 5)
    w.writeBase(5L, 500L, "X", 6L, 70L)
    w.close()
    val c = DataFile.openRows(new java.io.File(d, "part-t2.parquet").getPath,
      5, Array(1, 3))
    assert(c.next())
    assert(c.get().toSeq == Seq(null, 500L, null, 6L, null))
    c.close()
  }

  test("pre-evolution file pads missing trailing columns with null") {
    val d = tmpDir()
    val w = DataFile.writer(d.getPath, "part-t3.parquet", 5)
    w.writeBase(9L, 900L, "Y", 1L, 2L)
    w.close()
    // read at the EVOLVED arity (7): the file has no c5/c6
    val c = DataFile.openRows(new java.io.File(d, "part-t3.parquet").getPath,
      7, DataFile.allCols(7))
    assert(c.next())
    assert(c.get().toSeq == Seq(9L, 900L, "Y", 1L, 2L, null, null))
    c.close()
  }

  test("writer pads short rows to the declared arity") {
    val d = tmpDir()
    val w = DataFile.writer(d.getPath, "part-t4.parquet", 7)
    w.write(row(1L, 10L, "Z", 2L, 3L)) // 5-long row into a 7-col file
    w.close()
    val c = DataFile.openRows(new java.io.File(d, "part-t4.parquet").getPath,
      7, DataFile.allCols(7))
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
      6, DataFile.allCols(6))
    assert(c.next())
    assert(c.get().toSeq == Seq(1L, 100L, "A", 2L, 30L, 7L))
    assert(c.next())
    assert(c.get().toSeq == Seq(2L, 200L, "B", 3L, 40L, null))
    assert(!c.next())
    c.close()
  }

  test("spark reads our parquet data files natively (positional names)") {

    val d = tmpDir()
    val w = DataFile.writer(d.getPath, "part-t6.parquet", 5)
    w.writeBase(1L, 100L, "A", 2L, 30L)
    w.writeBase(2L, 200L, "B", 3L, 40L)
    w.close()
    val df = spark.read.parquet(new java.io.File(d, "part-t6.parquet").getPath)
    assert(df.columns.toSeq == Seq("c0", "c1", "c2", "c3", "c4"))
    assert(df.count() == 2L)
  }
}
