package graft.scale

import graft.SparkSpec

/** q234: the bucket-stitched run count must equal a driver-side
  * single-pass scan in the same total order (the whole point of the
  * boundary correction), and the recommendation must be the argmin
  * of the three size estimates.
  */
class EncodingAdvisorSpec extends SparkSpec {

  test("q234: stitched runs == sequential scan; recommendation is the argmin") {
    val out = graft.SparkEntry.queries("q234_encoding_advisor")(spark, sf).collect()
    assert(out.length == 4)
    val li = graft.Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
        "CAST(CAST(l_quantity AS BIGINT) AS STRING) AS q", "CAST(l_suppkey AS STRING) AS s")
      .collect()
    val cols = Map[String, org.apache.spark.sql.Row => String](
      "l_returnflag" -> (_.getAs[String]("l_returnflag")),
      "l_linestatus" -> (_.getAs[String]("l_linestatus")),
      "l_quantity" -> (_.getAs[String]("q")),
      "l_suppkey" -> (_.getAs[String]("s")))
    out.foreach { r =>
      val cname = r.getAs[String]("cname")
      val get = cols(cname)
      val seq = li.map(row => (row.getAs[Long]("l_orderkey"),
        row.getAs[Int]("l_linenumber"), get(row))).sortBy(identity).map(_._3)
      val runs = 1L + seq.sliding(2).count { case Array(a, b) => a != b; case _ => false }
      assert(r.getAs[Long]("runs") == runs, s"$cname runs")
      assert(r.getAs[Long]("n") == seq.length.toLong)
      assert(r.getAs[Long]("ndv") == seq.distinct.length.toLong)
      val (p, d, rl) = (r.getAs[Long]("plain_bytes"), r.getAs[Long]("dict_bytes"),
        r.getAs[Long]("rle_bytes"))
      val want = if (rl <= d && rl <= p) "rle_dict" else if (d <= p) "dict" else "plain"
      assert(r.getAs[String]("recommended") == want, s"$cname recommendation")
    }
    // the profile must actually discriminate: enum-grade columns
    // should not recommend plain
    val rec = out.map(r => r.getAs[String]("cname") -> r.getAs[String]("recommended")).toMap
    assert(rec("l_returnflag") != "plain" && rec("l_linestatus") != "plain")
  }
}
