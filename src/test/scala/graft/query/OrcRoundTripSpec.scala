package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q243: the ORC scan must receive the pushed predicates and a pruned
  * schema — format coverage is only real if the optimizer treats the
  * format as a first-class scan.
  */
class OrcRoundTripSpec extends SparkSpec {

  test("q243: predicates push into the ORC scan; schema prunes") {
    graft.SparkEntry.queries("q243_orc_roundtrip")(spark, sf).collect()
    val tag = java.lang.Long.toHexString(sf.hashCode.toLong & 0xffffffffL)
    val path = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_orc_lineitem_$tag").getAbsolutePath
    val df = spark.read.format("orc").load(path)
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .select(col("l_shipdate"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_returnflag"),
      s"expected pushed ORC filters:\n$plan")
    assert(!plan.contains("l_extendedprice"),
      "unreferenced columns must not reach the ORC ReadSchema")
    assert(df.count() > 0)
  }
}
