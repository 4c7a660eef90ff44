package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The custom top-k-per-key operator: result parity with the window
  * formulation, the two-phase (partial → exchange → final) plan
  * shape that is its whole reason to exist, and edge cases the
  * supplier data doesn't hit.
  */
class TopKPlanSpec extends SparkSpec {

  import spark.implicits._

  private def supplier = Tables.supplier(spark, sf)
    .select(col("s_nationkey"), col("s_suppkey"), col("s_name"), col("s_acctbal"))

  test("matches the window row_number formulation row-for-row") {
    val custom = TopK.topKPerKey(supplier,
      Seq(col("s_nationkey")), Seq(col("s_acctbal").desc, col("s_suppkey").asc), 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s_nationkey")).orderBy(col("s_acctbal").desc, col("s_suppkey"))
    val windowed = supplier.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(custom.exceptAll(windowed).count() == 0 &&
      windowed.exceptAll(custom).count() == 0,
      "custom plan and window formulation must agree exactly")
  }

  test("plans as partial -> exchange -> final (the map-side combine)") {
    val custom = TopK.topKPerKey(supplier,
      Seq(col("s_nationkey")), Seq(col("s_acctbal").desc, col("s_suppkey").asc), 3)
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), s"missing partial phase:\n$plan")
    assert(plan.contains("TopKPerKeyFinal"), s"missing final phase:\n$plan")
    // the exchange must sit BETWEEN the phases (tree prints parents
    // first: final above the exchange, partial below it) — partial
    // runs on scan partitions and only its survivors are shuffled
    val finalIdx = plan.indexOf("TopKPerKeyFinal")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf("TopKPerKeyPartial")
    assert(exchangeIdx >= 0, s"no hash exchange planned:\n$plan")
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx,
      s"phases not split around the exchange:\n$plan")
  }

  test("groups smaller than k, duplicate order values, k=1") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 5.0), ("a", 4L, 20.0),
      ("b", 5L, 1.0),
    ).toDF("key", "id", "score")
    val top2 = TopK.topKPerKey(df, Seq(col("key")),
        Seq(col("score").desc, col("id").asc), 2)
      .orderBy("key", "id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // a: 20.0 (id 4) then the 10.0 tie broken by id asc -> id 1
    // b: the whole (undersized) group survives
    assert(top2.toSeq == Seq(("a", 1L), ("a", 4L), ("b", 5L)), top2.toSeq.toString)
    val top1 = TopK.topKPerKey(df, Seq(col("key")),
        Seq(col("score").desc, col("id").asc), 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(top1 == Set(("a", 4L), ("b", 5L)), top1.toString)
  }

  test("strategy injects via the extensions entry point too") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    // buildPlannerStrategies is internal; it suffices that apply()
    // executed the injection without error AND the live-session hook
    // is idempotent
    TopK.ensureRegistered(spark)
    TopK.ensureRegistered(spark)
    assert(spark.experimental.extraStrategies.count(_ == TopKPerKeyStrategy) == 1)
  }
}
