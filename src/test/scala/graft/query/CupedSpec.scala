package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q230: driver-side BigInt recompute of the CUPED readout, plus the
  * structural identity that makes CUPED unbiased — the user-weighted
  * adjusted means recombine to the raw pooled mean (Σ(xᵢ−x̄) = 0).
  */
class CupedSpec extends SparkSpec {

  test("q230: arm rows match a BigInt recompute; adjustment preserves the pooled mean") {
    val out = graft.SparkEntry.queries("q230_cuped_readout")(spark, sf)
      .collect().sortBy(_.getAs[Long]("arm"))
    assert(out.length == 2, "both arms present")

    // driver recompute of (x, y, arm) per user
    val users = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_type")).collect()
      .groupBy(_.getAs[Number]("user_id").longValue).map { case (uid, evs) =>
        // UTC session: normalize either collected timestamp flavor to epoch micros
        val boundUs = java.time.LocalDateTime.parse("2024-01-16T00:00:00")
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
        def usOf(r: org.apache.spark.sql.Row): Long = r.getAs[Any]("ts") match {
          case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000) % 1000
          case t: java.time.Instant => t.getEpochSecond * 1000000L + t.getNano / 1000
          case t: java.time.LocalDateTime =>
            t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L + t.getNano / 1000
        }
        val x = evs.count(r => usOf(r) < boundUs).toLong
        val y = evs.count(r => usOf(r) >= boundUs &&
          r.getAs[String]("event_type") == "purchase").toLong
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$uid:q230".getBytes("UTF-8")).map("%02x".format(_)).mkString
        val arm = (BigInt(md.take(15), 16) % 2).toLong
        (uid, x, y, arm)
      }.toSeq
    val n = BigInt(users.length)
    val sx = users.map(u => BigInt(u._2)).sum
    val sy = users.map(u => BigInt(u._3)).sum
    val sxx = users.map(u => BigInt(u._2) * u._2).sum
    val sxy = users.map(u => BigInt(u._2) * u._3).sum
    val syy = users.map(u => BigInt(u._3) * u._3).sum
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy

    def floorDiv(a: BigInt, b: BigInt): BigInt = a / b // BigInt / truncates toward zero, same as DIV

    out.foreach { r =>
      val arm = r.getAs[Long]("arm")
      val grp = users.filter(_._4 == arm)
      val nA = BigInt(grp.length)
      val sxA = grp.map(u => BigInt(u._2)).sum
      val syA = grp.map(u => BigInt(u._3)).sum
      assert(r.getAs[Long]("n_arm") == nA)
      assert(BigInt(r.getAs[Long]("mean_x_micro")) == floorDiv(sxA * 1000000, nA))
      assert(BigInt(r.getAs[Long]("mean_y_micro")) == floorDiv(syA * 1000000, nA))
      val adjNum = (syA * varx * n - cov * (sxA * n - sx * nA)) * 1000000
      val adjDen = nA * varx * n
      assert(BigInt(r.getAs[Long]("adj_mean_y_micro")) == floorDiv(adjNum, adjDen))
      assert(BigInt(r.getAs[Long]("theta_micro")) == floorDiv(cov * 1000000, varx))
      assert(BigInt(r.getAs[Long]("var_reduction_ppm")) == floorDiv(cov * cov * 1000000, varx * vary))
    }

    // unbiasedness identity in exact rationals:
    //   Σ_arm n_a · adj_a = Σ y  (both scaled by varx·n)
    val lhs = out.map { r =>
      val arm = r.getAs[Long]("arm")
      val grp = users.filter(_._4 == arm)
      val nA = BigInt(grp.length)
      val sxA = grp.map(u => BigInt(u._2)).sum
      val syA = grp.map(u => BigInt(u._3)).sum
      syA * varx * n - cov * (sxA * n - sx * nA)
    }.sum
    assert(lhs == sy * varx * n, "CUPED adjustment must conserve the pooled total")
  }
}
