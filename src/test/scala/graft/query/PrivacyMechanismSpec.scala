package graft.query

import graft.{SparkEntry, SparkSpec}
import java.math.BigInteger
import java.security.MessageDigest

/** q219/q220: scala recompute of the t-closeness EMD and the
  * randomized-response mechanism + debiasing, independent of both
  * engines' SQL.
  */
class PrivacyMechanismSpec extends SparkSpec {

  private def md5Bit(id: Long, salt: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest((id.toString + salt).getBytes("UTF-8"))
    new BigInteger(d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
      .mod(BigInteger.TWO).longValue
  }

  test("q219: EMD recompute matches; small cells leak (>=1 violation at sf0.001)") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(date_trunc('day', ts) AS DATE) AS day",
        "CAST(floor(value / 50) AS BIGINT) AS band").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val bands = ev.map(_._3).distinct.sorted
    val m = bands.length
    val nTotal = ev.length.toLong
    val globalCum = bands.map(b => b -> ev.count(_._3 <= b).toLong).toMap
    val cells = ev.groupBy(e => (e._1, e._2))
    val expected = cells.map { case ((t, d), rows) =>
      val ng = rows.length.toLong
      val emdNum = bands.map { b =>
        val cumg = rows.count(_._3 <= b).toLong
        (BigInt(cumg) * nTotal - BigInt(globalCum(b)) * ng).abs
      }.sum
      val tppm = (emdNum * 1000000 / (BigInt(ng) * nTotal * (m - 1))).toLong
      (t, d, ng, tppm)
    }.toSeq.sortBy { case (t, d, _, p) => (-p, t, d) }.take(10)
    val got = SparkEntry.queries("q219_t_closeness")(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toLocalDateTime.toLocalDate.toString,
        r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(got.map(g => (g._1, g._2, g._3, g._4)).toSeq == expected)
    got.foreach { g => assert((g._5 == 1) == (g._4 > 200000L)) }
    assert(got.exists(_._5 == 1),
      "no violating cell at sf0.001 - the flag never exercises both values")
  }

  test("q220: mechanism + debias recompute; estimator tracks the true rate") {
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("event_id", "CAST(date_trunc('day', ts) AS DATE) AS day",
        "CAST(event_type = 'error' AS LONG) AS s").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2)))
    val byDay = ev.groupBy(_._2)
    val expected = byDay.map { case (d, rows) =>
      val n = rows.length.toLong
      val tc = rows.map(_._3).sum
      val obs = rows.map { case (id, _, s) =>
        if (md5Bit(id, ":rr1") == 0) s else md5Bit(id, ":rr2")
      }.sum
      val est = (4 * obs - n) * 1000000L / (2 * n)
      d -> (n, tc, obs, tc * 1000000L / n, est)
    }
    val got = SparkEntry.queries("q220_randomized_response")(spark, sf).collect()
    assert(got.length == byDay.size)
    got.foreach { r =>
      val d = r.getTimestamp(0).toLocalDateTime.toLocalDate.toString
      val (n, tc, obs, tppm, est) = expected(d)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
        ((n, tc, obs, tppm, est)), s"day $d")
      assert(r.getLong(6) == math.abs(est - tppm))
    }
    // debiasing sanity on the whole month: the mean estimate sits near
    // the mean true rate (RR noise cancels across ~600 trials/day)
    val meanTrue = got.map(_.getLong(4)).sum / got.length
    val meanEst = got.map(_.getLong(5)).sum / got.length
    assert(math.abs(meanEst - meanTrue) < 100000L,
      s"debiased mean $meanEst vs true $meanTrue - mechanism or algebra broken")
  }
}
