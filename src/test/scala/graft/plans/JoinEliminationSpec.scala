package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
import org.apache.spark.sql.functions._

/** JoinEliminationRule: with the FK validated+registered, the
  * customer→nation join must VANISH from the optimized plan and the
  * result must equal the un-eliminated run; unsound candidates must
  * be refused at registration; unrelated plans must be untouched.
  */
class JoinEliminationSpec extends SparkSpec {

  private def fk = FkDescriptor(
    childPath = s"$sf/customer.parquet", childCol = "c_nationkey",
    parentPath = s"$sf/nation.parquet", parentCol = "n_nationkey")

  private def joined = {
    val cust = Tables.customer(spark, sf)
    val nat = Tables.nation(spark, sf)
    cust.join(nat, cust("c_nationkey") === nat("n_nationkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("c_nationkey").cast("long")).as("key_sum"))
      .orderBy(col("c_mktsegment"))
  }

  test("registered FK: join vanishes from the plan, result unchanged") {
    JoinElimination.ensureInjected(spark)
    FkRegistry.clear()
    val before = joined.collect()
    assert(joined.queryExecution.optimizedPlan.collect { case j: LJoin => j }.nonEmpty)

    FkRegistry.validateAndRegister(
      Tables.customer(spark, sf), Tables.nation(spark, sf), fk)
    try {
      val df = joined
      val joins = df.queryExecution.optimizedPlan.collect { case j: LJoin => j }
      assert(joins.isEmpty, s"join not eliminated:\n${df.queryExecution.optimizedPlan}")
      assert(df.collect().toSeq == before.toSeq, "elimination changed the result")
    } finally FkRegistry.clear()
  }

  test("a query that reads parent columns is NOT rewritten") {
    JoinElimination.ensureInjected(spark)
    FkRegistry.validateAndRegister(
      Tables.customer(spark, sf), Tables.nation(spark, sf), fk)
    try {
      val cust = Tables.customer(spark, sf)
      val nat = Tables.nation(spark, sf)
      val df = cust.join(nat, cust("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      assert(df.queryExecution.optimizedPlan.collect { case j: LJoin => j }.nonEmpty,
        "a query referencing n_name must keep the join")
    } finally FkRegistry.clear()
  }

  test("outer joins and non-FK equi-joins are untouched") {
    JoinElimination.ensureInjected(spark)
    FkRegistry.validateAndRegister(
      Tables.customer(spark, sf), Tables.nation(spark, sf), fk)
    try {
      val cust = Tables.customer(spark, sf)
      val nat = Tables.nation(spark, sf)
      val left = cust.join(nat, cust("c_nationkey") === nat("n_nationkey"), "left")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      assert(left.queryExecution.optimizedPlan.collect { case j: LJoin => j }.nonEmpty,
        "left join must not be eliminated (contract is inner-only)")
    } finally FkRegistry.clear()
  }

  test("a row policy on the PARENT blocks elimination (rule interaction soundness)") {
    // if nation rows can be filtered by policy, the FK join is no
    // longer row-preserving — elimination must back off because the
    // parent side is no longer a bare scan
    JoinElimination.ensureInjected(spark)
    RowPolicy.ensureInjected(spark)
    FkRegistry.validateAndRegister(
      Tables.customer(spark, sf), Tables.nation(spark, sf), fk)
    PolicyRegistry.register(PolicyDescriptor(s"$sf/nation.parquet", "n_nationkey < 13"))
    try {
      val withPolicy = joined.collect()
      val joins = joined.queryExecution.optimizedPlan.collect { case j: LJoin => j }
      assert(joins.nonEmpty, "policy-filtered parent must keep the join")
      // and the policy actually bit: fewer rows than the open join
      PolicyRegistry.clear()
      val open = joined.collect()
      assert(withPolicy.map(_.getAs[Long]("n")).sum < open.map(_.getAs[Long]("n")).sum,
        "policy should remove some joined rows")
    } finally { PolicyRegistry.clear(); FkRegistry.clear() }
  }

  test("child key behind an outer join: result stays correct either way") {
    // orders LEFT JOIN customer puts the registered child scan on the
    // null-producing side. Catalyst's EliminateOuterJoin converts
    // this to INNER before user rules run (the FK join's own
    // condition null-rejects c_nationkey), after which elimination is
    // sound again — so the contract to pin is RESULT EQUALITY, and
    // the lineage walk is the backstop for shapes Catalyst cannot
    // convert (see the union test below).
    JoinElimination.ensureInjected(spark)
    val cust = Tables.customer(spark, sf)
    val nat = Tables.nation(spark, sf)
    val ord = Tables.orders(spark, sf)
      .select((col("o_custkey") % lit(100000L)).as("o_custkey"), col("o_orderkey"))
    def df = ord.join(cust, ord("o_custkey") === cust("c_custkey"), "left")
      .join(nat, col("c_nationkey") === nat("n_nationkey"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_custkey"))
    FkRegistry.clear()
    val expected = df.collect().toSeq
    FkRegistry.validateAndRegister(cust, nat, fk)
    try assert(df.collect().toSeq == expected, "rewrite changed an outer-join pipeline")
    finally FkRegistry.clear()
  }

  test("a union child side never matches (values from an unregistered leaf)") {
    // customer.c_nationkey UNION ALL supplier.s_nationkey: the column
    // NAME and half the lineage match the registered child, but union
    // values can come from supplier, where no containment proof
    // exists — Catalyst cannot sanitize this shape, so the lineage
    // walk must refuse it.
    JoinElimination.ensureInjected(spark)
    FkRegistry.validateAndRegister(
      Tables.customer(spark, sf), Tables.nation(spark, sf), fk)
    try {
      val nat = Tables.nation(spark, sf)
      val childSide = Tables.customer(spark, sf).select(col("c_nationkey"))
        .unionAll(Tables.supplier(spark, sf).select(col("s_nationkey").as("c_nationkey")))
      val df = childSide.join(nat, col("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
      val joins = df.queryExecution.optimizedPlan.collect { case j: LJoin => j }
      assert(joins.nonEmpty,
        s"union-sourced key must keep the join:\n${df.queryExecution.optimizedPlan}")
    } finally FkRegistry.clear()
  }

  test("a same-named key from a DIFFERENT leaf does not match the registered child") {
    // supplier also has a column named after the child key once
    // aliased: build a frame whose c_nationkey really comes from
    // supplier.s_nationkey — the child scan (customer) is among the
    // leaves, but the join key's lineage ends at supplier, where no
    // non-null/containment proof exists. Must NOT eliminate.
    JoinElimination.ensureInjected(spark)
    FkRegistry.validateAndRegister(
      Tables.customer(spark, sf), Tables.nation(spark, sf), fk)
    try {
      val cust = Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment"))
      val supp = Tables.supplier(spark, sf)
        .select(col("s_suppkey"), col("s_nationkey").as("c_nationkey"))
      val nat = Tables.nation(spark, sf)
      val childSide = cust.join(supp, cust("c_custkey") === supp("s_suppkey"))
      val df = childSide.join(nat, col("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val joins = df.queryExecution.optimizedPlan.collect { case j: LJoin => j }
      assert(joins.size >= 2,
        s"decoy-named key must keep the join:\n${df.queryExecution.optimizedPlan}")
    } finally FkRegistry.clear()
  }

  test("unsound constraints are refused at registration") {
    // orders.o_custkey -> customer with a DUPLICATED 'parent': parent
    // key not unique => must throw
    val notAPk = Tables.orders(spark, sf).select(col("o_custkey").as("k"))
    intercept[IllegalArgumentException] {
      FkRegistry.validateAndRegister(
        Tables.orders(spark, sf), notAPk,
        FkDescriptor(s"$sf/orders.parquet", "o_custkey", s"$sf/orders.parquet", "k"))
    }
    assert(FkRegistry.all.isEmpty)
  }
}
