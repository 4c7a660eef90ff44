package graft.query

import graft.{SparkEntry, SparkSpec}
import java.math.BigInteger
import java.security.MessageDigest

/** q216/q217/q223: driver-side recompute of the KMV estimator, the
  * theta-sketch survivor algebra, and the CBO join estimate — plus
  * the structural facts that make each demo meaningful (estimating
  * regime reached, sets genuinely distinct, FK spine exact).
  */
class EstimationSpec extends SparkSpec {

  private val Space = BigInteger.valueOf(1152921504606846976L)

  private def h60(id: Long, salt: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest((id.toString + salt).getBytes("UTF-8"))
    new BigInteger(d.map(b => f"$b%02x").mkString.substring(0, 15), 16).longValue
  }

  test("q216: KMV estimate equals the hand-computed (k-1)*2^60/h_(k)") {
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_partkey").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byGrp = li.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct }
    val got = SparkEntry.queries("q216_kmv_distinct")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == byGrp.keySet)
    byGrp.foreach { case (g, keys) =>
      val hashes = keys.map(h60(_, ":kmv")).sorted
      val r = got(g)
      assert(r.getLong(1) == keys.length.toLong, s"$g n_exact")
      if (keys.length < 64) {
        assert(r.isNullAt(2) && r.getLong(3) == keys.length.toLong, s"$g exact-small regime")
      } else {
        val kth = hashes(63)
        val est = BigInteger.valueOf(63).multiply(Space)
          .divide(BigInteger.valueOf(kth)).longValue
        assert(r.getLong(2) == kth && r.getLong(3) == est, s"$g estimator")
        assert(r.getLong(4) == math.abs(est - keys.length.toLong) * 1000000L / keys.length,
          s"$g err_ppm")
      }
    }
    // the demo must reach the estimating regime (not the exact-small
    // branch) at every SF - 200+ parts per flag from sf0.001 up
    assert(byGrp.values.forall(_.length >= 64), "group below k - demo vacuous")
  }

  test("q217: theta survivor algebra matches a full recompute; sets are distinct") {
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_returnflag", "l_quantity").collect()
    val a = li.filter(_.getString(1) == "R").map(_.getLong(0)).distinct.toSet
    val b = li.filter(_.getDouble(2) >= 48).map(_.getLong(0)).distinct.toSet
    val union = (a ++ b).toSeq.map(k => (h60(k, ":kmv"), a(k), b(k))).sortBy(_._1)
    val theta = if (union.length >= 64) union(63)._1 else Space.longValue
    val surv = union.take(math.min(63, union.length)).filter(_._1 < theta)
    def est(cnt: Int) = BigInteger.valueOf(cnt).multiply(Space)
      .divide(BigInteger.valueOf(theta)).longValue
    val r = SparkEntry.queries("q217_theta_set_ops")(spark, sf).collect()(0)
    assert(r.getLong(0) == theta)
    assert(r.getLong(1) == a.size.toLong && r.getLong(2) == b.size.toLong)
    assert(r.getLong(3) == (a ++ b).size.toLong && r.getLong(4) == (a & b).size.toLong)
    assert(r.getLong(5) == est(surv.length))
    assert(r.getLong(6) == est(surv.count(s => s._2 && s._3)))
    // the demo sets must be genuinely distinct (A ⊄ B, B ⊄ A) or the
    // overlap question is vacuous
    assert((a -- b).nonEmpty && (b -- a).nonEmpty && (a & b).nonEmpty)
    // union estimate lands within the k=64 error envelope on this data
    val rel = math.abs(r.getLong(5) - (a ++ b).size.toLong).toDouble / (a ++ b).size
    assert(rel < 0.5, s"union estimate off by ${rel * 100}%")
  }

  test("q223: FK-spine estimates are exact (containment + unique build side)") {
    val rows = SparkEntry.queries("q223_join_cardinality")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("customer_orders", "orders_lineitem"))
    val nOrders = graft.Tables.orders(spark, sf).count()
    val nLines = graft.Tables.lineitem(spark, sf).count()
    // every order has a customer, every line an order, and the build
    // keys are unique — per-bucket containment makes the System-R
    // estimate collapse to the probe count exactly
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"${r.getString(0)} est != actual")
      assert(r.getLong(3) == 0L)
    }
    assert(rows(0).getLong(2) == nOrders && rows(1).getLong(2) == nLines)
  }
}
