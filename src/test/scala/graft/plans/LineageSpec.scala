package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** ColumnLineage: transitive alias chains, multi-source expressions,
  * and join pass-through must all resolve to the right scan columns.
  */
class LineageSpec extends SparkSpec {

  test("lineage traces alias chains, multi-source derivations, and literals") {
    val df = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_acctbal").as("bal1"), col("n_name"), col("c_custkey"))
      .select((col("bal1") * 2).as("bal2"), col("n_name"), col("c_custkey"))
      .select(concat(col("n_name"), col("bal2").cast("string")).as("tagged"),
        lit(1).as("one"), col("c_custkey").as("ck"))
    val lin = ColumnLineage.lineage(df).groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    assert(lin("tagged") == Set(("nation", "n_name"), ("customer", "c_acctbal")),
      s"multi-source through a 2-deep alias chain: ${lin("tagged")}")
    assert(lin("one") == Set(("<literal>", "<none>")))
    assert(lin("ck") == Set(("customer", "c_custkey")))
  }

  test("q240: registered lineage readout is the static contract") {
    val got = graft.SparkEntry.queries("q240_column_lineage")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(
      ("c_mktsegment", "customer", "c_mktsegment"),
      ("n_name", "nation", "n_name"),
      ("n_orders", "<literal>", "<none>"),
      ("revenue_cents", "orders", "o_totalprice")))
  }
}
