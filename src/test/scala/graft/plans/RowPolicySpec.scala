package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** RowPolicyRule: transparent enforcement, pushdown to the scan,
  * fixed-point idempotence, self-join instances each guarded, and
  * no effect on unregistered tables.
  */
class RowPolicySpec extends SparkSpec {

  private def withPolicy[A](pred: String)(f: => A): A = {
    RowPolicy.ensureInjected(spark)
    PolicyRegistry.register(PolicyDescriptor(s"$sf/customer.parquet", pred))
    try f finally PolicyRegistry.clear()
  }

  test("policy rows are absent and the predicate reaches PushedFilters") {
    val open = Tables.customer(spark, sf).count()
    withPolicy("c_nationkey % 5 <> 0") {
      val df = Tables.customer(spark, sf).filter(col("c_acctbal") >= 0)
      val n = df.count()
      assert(n < open, "policy must drop rows")
      val leaked = df.filter(expr("c_nationkey % 5 = 0")).count()
      assert(leaked == 0, "no policy-violating row may surface")
      val scan = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.head
      // the modular predicate itself isn't a parquet filter, but its
      // IsNotNull prerequisite + the user filter must both push —
      // assert the filter made it into the scan node's data filters
      assert(scan.dataFilters.exists(_.toString.contains("% 5")),
        s"policy not in scan dataFilters: ${scan.dataFilters}")
    }
  }

  test("idempotent under the fixed point: exactly one policy conjunct per scan instance") {
    withPolicy("c_nationkey % 5 <> 0") {
      val cust = Tables.customer(spark, sf)
      val a = cust.as("a"); val b = cust.as("b")
      val joined = a.join(b, col("a.c_custkey") === col("b.c_custkey"))
        .filter(col("a.c_acctbal") >= 0)
      val plan = joined.queryExecution.optimizedPlan
      val policyConjuncts = plan.collect {
        case org.apache.spark.sql.catalyst.plans.logical.Filter(c, _) =>
          c.toString.split("AND").count(_.contains("% 5"))
      }.sum
      assert(policyConjuncts == 2,
        s"each self-join instance guarded exactly once, got $policyConjuncts:\n$plan")
      // both sides enforce: no violating pair survives
      assert(joined.filter(expr("a.c_nationkey % 5 = 0 OR b.c_nationkey % 5 = 0")).count() == 0)
    }
  }

  test("unregistered tables are untouched") {
    withPolicy("c_nationkey % 5 <> 0") {
      assert(Tables.nation(spark, sf).count() == 25)
    }
  }
}
