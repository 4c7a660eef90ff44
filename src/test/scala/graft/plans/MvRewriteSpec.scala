package graft.plans

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** MV rewrite: the rule actually redirects matching aggregates to the
  * MV scan (positive, incl. the coarser-grain rollup q210 ships),
  * refuses non-matching shapes (negative), and the rewritten results
  * are bit-identical to the base.
  */
class MvRewriteSpec extends SparkSpec {

  private val measure = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

  private def plannedScans(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q210 answers from the MV scan, bit-identical to the base") {
    val df = SparkEntry.queries("q210_mv_rewrite")(spark, sf)
    val plan = plannedScans(df)
    assert(plan.contains("graft_mv_orders"), s"plan does not scan the MV:\n$plan")
    assert(!plan.contains("orders.parquet"), s"plan still scans the base:\n$plan")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(sum(expr(measure)).as("revenue_c"), count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("exact-grain match rewrites; unregistered measure and dim do not") {
    MvRewrite.ensureInjected(spark)
    val mvPath = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_mv_spec").getAbsolutePath
    val base = Tables.orders(spark, sf)
    base.groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(sum(expr(measure)).as("rev_c"), count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(mvPath)
    MvRegistry.register(MvDescriptor(
      basePath = s"$sf/orders.parquet",
      mvPath = mvPath,
      dims = Set("o_orderpriority", "o_orderstatus"),
      measures = Map(MvRewrite.measureFingerprint(base, measure) -> "rev_c"),
      cntCol = "cnt"))
    try {
      // positive: the MV's exact grain
      val exact = Tables.orders(spark, sf)
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(sum(expr(measure)).as("rev"), count(lit(1)).as("n"))
      assert(plannedScans(exact).contains("graft_mv_spec"))
      val viaMv = exact.orderBy("o_orderpriority", "o_orderstatus").collect().toSeq
      // negative: a measure the MV does not carry
      val badMeasure = Tables.orders(spark, sf)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("o_orderkey")).as("s"))
      assert(!plannedScans(badMeasure).contains("graft_mv_spec"))
      // negative: a grouping column outside the MV grain
      val badDim = Tables.orders(spark, sf)
        .groupBy(col("o_custkey"))
        .agg(sum(expr(measure)).as("rev"))
      assert(!plannedScans(badDim).contains("graft_mv_spec"))
      // rewritten result == base result, bit for bit
      MvRegistry.unregister(mvPath)
      val direct = Tables.orders(spark, sf)
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(sum(expr(measure)).as("rev"), count(lit(1)).as("n"))
        .orderBy("o_orderpriority", "o_orderstatus").collect().toSeq
      assert(viaMv == direct)
    } finally MvRegistry.unregister(mvPath)
  }

  test("a row policy on the BASE table blocks the MV redirect (rule interaction)") {
    MvRewrite.ensureInjected(spark)
    RowPolicy.ensureInjected(spark)
    val mvPath = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_mv_polspec").getAbsolutePath
    val base = Tables.orders(spark, sf)
    base.groupBy(col("o_orderpriority"))
      .agg(sum(expr(measure)).as("rev_c"), count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(mvPath)
    MvRegistry.register(MvDescriptor(
      basePath = s"$sf/orders.parquet", mvPath = mvPath,
      dims = Set("o_orderpriority"),
      measures = Map(MvRewrite.measureFingerprint(base, measure) -> "rev_c"),
      cntCol = "cnt"))
    PolicyRegistry.register(PolicyDescriptor(s"$sf/orders.parquet", "o_orderkey % 2 = 0"))
    try {
      val q = Tables.orders(spark, sf)
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(!plannedScans(q).contains("graft_mv_polspec"),
        "MV redirect would bypass the row policy's filter")
      // and the policy is live: fewer rows than the open count
      val guarded = q.agg(sum(col("n"))).collect().head.getLong(0)
      PolicyRegistry.clear()
      val open = Tables.orders(spark, sf)
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n"))).collect().head.getLong(0)
      assert(guarded < open)
    } finally { PolicyRegistry.clear(); MvRegistry.unregister(mvPath) }
  }
}
