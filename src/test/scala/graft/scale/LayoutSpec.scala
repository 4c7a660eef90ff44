package graft.scale

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q104: z-value interleave is the Morton bijection") {
    // hand-check a few points against the bit definition
    val df = spark.range(1).select(
      Layout.zValue(lit(0L), lit(0L)).as("z00"),
      Layout.zValue(lit(1L), lit(0L)).as("z10"),
      Layout.zValue(lit(0L), lit(1L)).as("z01"),
      Layout.zValue(lit(3L), lit(5L)).as("z35"),
      Layout.zValue(lit(1048575L), lit(1048575L)).as("zbig"))
    val r = df.collect()(0)
    assert(r.getAs[Long]("z00") == 0L)
    assert(r.getAs[Long]("z10") == 1L)
    assert(r.getAs[Long]("z01") == 2L)
    // p=3 (bits 0,1 -> pos 0,2 = 5), s=5 (bits 0,2 -> pos 1,5 = 34)
    assert(r.getAs[Long]("z35") == 39L)
    // 20 low bits set in both dims -> all 40 low z bits set
    assert(r.getAs[Long]("zbig") == (1L << 40) - 1)
  }

  test("q104: cells partition the data and carry tight rectangles") {
    val cells = run("q104_zorder_layout").collect()
    assert(cells.nonEmpty && cells.length <= 16)
    val total = cells.map(_.getAs[Long]("n_rows")).sum
    val n = graft.Tables.lineitem(spark, sf).count()
    assert(total == n, s"cells must partition all $n rows, got $total")
    // clustering win: the AVERAGE cell rectangle must be materially
    // smaller than the global (partkey x suppkey) extent on at least
    // one axis — the property a random split does not have
    val pSpan = cells.map(c => c.getAs[Long]("p_max") - c.getAs[Long]("p_min")).sum /
      cells.length.toDouble
    val sSpan = cells.map(c => c.getAs[Long]("s_max") - c.getAs[Long]("s_min")).sum /
      cells.length.toDouble
    val li = graft.Tables.lineitem(spark, sf)
      .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
      .collect()(0)
    val pGlobal = (li.getLong(1) - li.getLong(0)).toDouble
    val sGlobal = (li.getLong(3) - li.getLong(2)).toDouble
    assert(pSpan < 0.8 * pGlobal || sSpan < 0.8 * sGlobal,
      s"z-cells show no clustering: pSpan=$pSpan/$pGlobal sSpan=$sSpan/$sGlobal")
  }

  test("q107: sort-merge join runs without an exchange under it") {
    val df = run("q107_bucketed_join")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    // the bucketed scan feeds the join directly: no shuffle on either
    // join key anywhere in the plan (the only exchange is the 5-row
    // priority aggregation)
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan)
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
    // and the answer is the answer: same rows as the plain join
    val plain = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(graft.etl.CleanExprs.moneySum(
        col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
    assert(df.collect().toSeq == plain.collect().toSeq)
  }
}
