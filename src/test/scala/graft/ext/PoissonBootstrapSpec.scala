package graft.ext

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q208 Poisson bootstrap: the full CI table recomputed driver-side
  * from first principles (ONE JVM MD5 per row → Kirsch–Mitzenmacher
  * replicate uniforms (h1 + b·h2) mod 1e9 → truncated Poisson(1)
  * weights → replicate means → order statistics).
  */
class PoissonBootstrapSpec extends SparkSpec {

  private val cum = Seq(367879441L, 735758882L, 919698602L, 981011843L, 996340153L)

  private def u(id: Long, b: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:q208".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1000000000L
    val h2 = java.lang.Long.parseLong(hex.substring(15, 30), 16) % 1000000000L
    (h1 + b * h2) % 1000000000L
  }

  private def w(id: Long, b: Int): Long = {
    val x = u(id, b)
    cum.indexWhere(x < _) match { case -1 => cum.length.toLong; case k => k.toLong }
  }

  test("bootstrap CIs match a driver-side md5 recompute") {
    val base = graft.Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = base.groupBy(_._1).map { case (seg, rows) =>
      val means = (0 until 64).flatMap { b =>
        val s1 = rows.map(r => w(r._2, b) * r._3).sum
        val s0 = rows.map(r => w(r._2, b)).sum
        if (s0 > 0) Some((s1 / s0, b)) else None
      }.sorted
      val n = rows.length.toLong
      seg -> (n, rows.map(_._3).sum / n, means(3)._1, means(60)._1)
    }
    val got = SparkEntry.queries("q208_poisson_bootstrap")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expected)
    // the interval is nontrivial and brackets the point estimate
    got.values.foreach { case (_, mean, lo, hi) =>
      assert(lo < hi && lo <= mean && mean <= hi)
    }
  }
}
