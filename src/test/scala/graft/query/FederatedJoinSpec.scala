package graft.query

import graft.SparkSpec

/** q239: the JDBC dimension must broadcast (the fact side never
  * reshuffles for the enrichment), and the JDBC round-trip must be
  * lossless vs the parquet dimension.
  */
class FederatedJoinSpec extends SparkSpec {

  test("q239: JDBC dim broadcasts; result equals all-parquet run") {
    val df = graft.SparkEntry.queries("q239_federated_join")(spark, sf)
    val rows = df.collect()
    assert(rows.length == 25)
    // toString shows the final plan even under AQE (node collect
    // can't descend into AdaptiveSparkPlanExec)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("JDBCRelation"),
      s"expected the JDBC dimension on a broadcast join:\n$plan")
    // all-parquet control
    import org.apache.spark.sql.functions._
    val control = graft.Tables.customer(spark, sf)
      .join(graft.Tables.orders(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum((col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long")).as("revenue_cents"))
      .orderBy(col("n_name")).collect()
    assert(rows.toSeq == control.toSeq, "JDBC path diverged from parquet path")
  }
}
