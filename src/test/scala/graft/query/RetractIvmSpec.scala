package graft.query

import graft.{SparkEntry, SparkSpec}

/** q189 retractable IVM: the oracle proves the maintenance identity
  * on real data; this fixture proves the retraction-specific edge the
  * testdata can't reach — a group whose maintained count hits zero
  * must disappear from the view.
  */
class RetractIvmSpec extends SparkSpec {

  private def md5mod37(k: Long): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(k.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(h.substring(0, 15), 16) % 37
  }

  test("a fully-retracted group drops from the maintained view; survivors keep exact sums") {
    import spark.implicits._
    // custkeys in/out of the erasure cohort, found by direct search
    val erased = (1L to 5000L).filter(md5mod37(_) == 0).take(2)
    val kept = (1L to 5000L).filter(md5mod37(_) != 0).take(2)
    val before = "1997-06-01 00:00:00" // < RetractCut
    val during = "1998-01-15 00:00:00" // in [RetractCut, RetractEnd)
    val rows = Seq(
      // DOOMED: only erased customers, only before the cut → count 0
      (101L, erased(0), "O", 100.00, before, "DOOMED"),
      (102L, erased(1), "O", 250.00, before, "DOOMED"),
      // KEPT: erased + surviving base rows + a window insert
      (201L, erased(0), "O", 999.99, before, "KEPT"),
      (202L, kept(0), "O", 10.00, before, "KEPT"),
      (203L, kept(1), "O", 20.00, during, "KEPT"),
      // LATE: arrives after the window → invisible to the view
      (301L, kept(0), "O", 77.00, "1999-06-01 00:00:00", "LATE"))
    val dir = java.nio.file.Files.createTempDirectory("graft_q189_fix").toString
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "d", "o_orderpriority")
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(d AS TIMESTAMP) AS o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q189_retractable_ivm")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    scala.util.Try(
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir)))
    assert(!out.contains("DOOMED"), "fully-retracted group must drop")
    assert(!out.contains("LATE"), "post-window arrivals must be invisible")
    assert(out("KEPT") == (2L, 3000L), s"KEPT must hold the two survivors, got ${out.get("KEPT")}")
  }
}
