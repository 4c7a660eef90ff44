package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q258: released counts must equal a driver-side replay of the
  * seeded two-sided-geometric mechanism (md5 uniform → threshold
  * inverse-CDF → clamp), the noise must actually perturb some cells,
  * and the ε ledger must compose.
  */
class DpReleaseSpec extends SparkSpec {

  private val eps1 = Seq(
    1147003L, 4264881L, 12740151L, 35778326L, 98402578L, 268632944L,
    731367055L, 901597421L, 964221673L, 987259848L, 995735118L, 998852996L)
  private val epsHalf = Seq(
    12670092L, 33559543L, 68000426L, 124783841L, 218403866L, 372757193L,
    627242806L, 781596133L, 875216158L, 931999573L, 966440456L, 987329907L)

  private def u(key: String, salt: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$key$salt".getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 1000000000L
  }

  private def noise(u: Long, cum: Seq[Long]): Long =
    cum.indexWhere(u < _) match { case -1 => 6L; case i => i - 6L }

  test("released counts equal the driver replay of the seeded mechanism") {
    val docs = graft.Tables.documents(spark, sf)
      .select("lang", "source").collect()
    val byLang = docs.groupBy(_.getString(0)).view.mapValues(_.length.toLong)
    val bySrc = docs.groupBy(_.getString(1)).view.mapValues(_.length.toLong)
    val expected =
      byLang.map { case (k, n) =>
        ("lang", k, math.max(n + noise(u(k, ":dp_lang"), eps1), 0L), 1000000L)
      }.toSeq ++
      bySrc.map { case (k, n) =>
        ("source", k, math.max(n + noise(u(k, ":dp_source"), epsHalf), 0L), 500000L)
      }.toSeq
    val got = SparkEntry.queries("q258_dp_release")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.sorted == expected.sorted)
    // the mechanism must actually perturb: not every cell can sit at
    // its true count (P ≈ 0.46^25 under the seeded draws)
    val trueCounts = expected.map { case (d, k, _, _) =>
      (d, k) -> (if (d == "lang") byLang(k) else bySrc(k))
    }.toMap
    assert(got.exists { case (d, k, rel, _) => rel != trueCounts((d, k)) },
      "no cell was perturbed — noise mapping is broken")
  }

  test("epsilon ledger: per-release budgets compose to the total") {
    val rows = SparkEntry.queries("q258_dp_release")(spark, sf).collect()
    val perDim = rows.map(r => r.getString(0) -> r.getLong(3)).distinct.toMap
    assert(perDim("lang") + perDim("source") == rows.head.getLong(4),
      "sequential composition must equal the stamped total")
  }
}
