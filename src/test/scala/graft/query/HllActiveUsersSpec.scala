package graft.query

import graft.{SparkEntry, SparkSpec}

/** Pins q134b (HLL-merge DAU/WAU) against its exact oracle-gated twin
  * q134: the datasketches HLL is deterministic for fixed input (no
  * seed), so the per-day estimates are stable and the error bound is
  * a real assertion, not a flaky tolerance. Default lgConfigK=12
  * gives ~1.6% typical relative error; 5% (with a floor of 2 for
  * tiny counts) leaves margin only for a genuine behavior change.
  */
class HllActiveUsersSpec extends SparkSpec {

  test("HLL DAU/WAU estimates track the exact fan-out within 5%") {
    val exact = SparkEntry.queries("q134_active_users")(spark, sf)
      .collect().map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2))).toMap
    val est = SparkEntry.queries("q134b_active_users_hll")(spark, sf)
      .collect().map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(est.keySet == exact.keySet, "day domains must match")
    exact.foreach { case (day, (dau, wau)) =>
      val (dauE, wauE) = est(day)
      def ok(e: Long, x: Long): Boolean = math.abs(e - x) <= math.max(2L, (0.05 * x).toLong)
      assert(ok(dauE, dau), s"$day dau est $dauE vs exact $dau out of bounds")
      assert(ok(wauE, wau), s"$day wau7 est $wauE vs exact $wau out of bounds")
    }
  }
}
