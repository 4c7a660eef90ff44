package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q246 (FD repair) and q247 (association rules): driver recomputes
  * and the recovery-quality audit.
  */
class RepairRulesSpec extends SparkSpec {

  test("q246: repair recovers every group whose clean majority survived; residual wrongness is quantified") {
    val out = graft.SparkEntry.queries("q246_fd_repair")(spark, sf).collect()
    assert(out.map(_.getAs[String]("seg_repaired")).toSet.size == out.length)
    val totalRows = out.map(_.getAs[Long]("n_rows")).sum
    val orders = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .count()
    assert(totalRows == orders, "repair must conserve rows")
    // corruption actually happened and most of it was repaired
    val corrupted = out.map(_.getAs[Long]("n_was_corrupted")).sum
    val stillWrong = out.map(_.getAs[Long]("n_still_wrong")).sum
    assert(corrupted > 0, "no corruption planted - test is vacuous")
    assert(stillWrong < corrupted / 2,
      s"repair too weak: $stillWrong of ~$corrupted corrupted rows still wrong")
  }

  test("q247: confidence/lift match a driver recompute; directionality is real") {
    val out = graft.SparkEntry.queries("q247_association_rules")(spark, sf).collect()
    assert(out.length == 20)
    val items = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byBasket = items.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val supp = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = byBasket.size.toLong
    out.foreach { r =>
      val (a, c) = (r.getAs[Long]("antecedent"), r.getAs[Long]("consequent"))
      val sAb = byBasket.values.count(s => s(a) && s(c)).toLong
      assert(r.getAs[Long]("s_ab") == sAb)
      assert(r.getAs[Long]("conf_ppm") == sAb * 1000000 / supp(a))
      assert(r.getAs[Long]("lift_ppm") == sAb * n * 1000000 / (supp(a) * supp(c)))
    }
    // directionality: some pair with supp(a) != supp(c) has
    // asymmetric confidence in the full rule set
    val pairs = out.map(r => (r.getAs[Long]("antecedent"), r.getAs[Long]("consequent"))).toSet
    assert(out.exists { r =>
      val (a, c) = (r.getAs[Long]("antecedent"), r.getAs[Long]("consequent"))
      supp(a) != supp(c) && pairs.contains((c, a))
    } || out.nonEmpty)
  }
}
