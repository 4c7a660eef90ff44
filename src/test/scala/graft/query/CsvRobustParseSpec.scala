package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** q237: pin the PERMISSIVE from_csv contract on single-line probes
  * (the empirical base the oracle's plant-rule mirror rests on), and
  * check the classification against a driver-side bucket recompute.
  */
class CsvRobustParseSpec extends SparkSpec {

  private val schema = StructType.fromDDL(
    "k BIGINT, name STRING, bal_cents BIGINT, _corrupt STRING")

  private def parse(line: String) = {
    import spark.implicits._
    Seq(line).toDF("line")
      .select(from_csv(col("line"), schema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")).as("p"))
      .select("p.*").collect().head
  }

  test("PERMISSIVE contract: field rot nulls the field, keeps the row flagged; arity errors flag; empty field is clean") {
    val rot = parse("7,SEG,N/A")
    assert(rot.getAs[Long]("k") == 7L && rot.getAs[Any]("bal_cents") == null
      && rot.getAs[String]("_corrupt") != null, "numeric rot: partial parse + flag")
    val short = parse("7,SEG")
    assert(short.getAs[Long]("k") == 7L && short.getAs[Any]("bal_cents") == null
      && short.getAs[String]("_corrupt") != null, "missing field: flag")
    val wide = parse("7,SEG,123,x")
    assert(wide.getAs[Long]("bal_cents") == 123L
      && wide.getAs[String]("_corrupt") != null, "extra field: parsed but flagged")
    val empty = parse("7,SEG,")
    assert(empty.getAs[Any]("bal_cents") == null
      && empty.getAs[String]("_corrupt") == null, "empty trailing field: clean NULL")
  }

  test("q237: classification cells match the plant rules") {
    val out = graft.SparkEntry.queries("q237_csv_robust_parse")(spark, sf).collect()
      .map(r => (r.getAs[Boolean]("is_corrupt"), r.getAs[Boolean]("has_bal")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_keys_recovered"), r.getAs[Long]("bal_cents_sum")))
      .toMap
    val cust = graft.Tables.customer(spark, sf)
      .selectExpr("c_custkey",
        "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bc").collect()
    def bucket(ck: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$ck:q237".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (BigInt(md.take(15), 16) % 20).toLong
    }
    val cells = cust.groupBy { r =>
      val b = bucket(r.getAs[Long]("c_custkey"))
      (b == 0 || b == 1 || b == 2, b == 2 || b >= 4)
    }.view.mapValues { rs =>
      (rs.length.toLong, rs.length.toLong,
        rs.map { r =>
          val b = bucket(r.getAs[Long]("c_custkey"))
          if (b == 2 || b >= 4) r.getAs[Long]("bc") else 0L
        }.sum)
    }.toMap
    assert(out == cells, s"got $out want $cells")
    // every planted class is actually present at this SF
    assert(out.keySet == Set((false, true), (false, false), (true, true), (true, false)))
  }
}
