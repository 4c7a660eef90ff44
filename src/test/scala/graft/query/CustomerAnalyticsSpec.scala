package graft.query

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Driver-side recomputes for the customer-analytics tier
  * (q224 RFM, q225 EWMA, q226 HITS).
  */
class CustomerAnalyticsSpec extends SparkSpec {

  private def rows(name: String): Array[Row] =
    graft.SparkEntry.queries(name)(spark, sf).collect()

  test("q224: segments partition the customer base, labels match scores") {
    val segs = rows("q224_rfm_segments")
    val nCust = segs.map(_.getAs[Long]("n_customers")).sum
    val base = graft.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(nCust == base, "every ordering customer lands in exactly one segment")
    // quintile balance: each score axis splits the base into 5 groups
    // differing by at most 1 (NTILE's contract)
    for (axis <- Seq("r_score", "f_score", "m_score")) {
      val byScore = segs.groupBy(_.getAs[Int](axis)).view
        .mapValues(_.map(_.getAs[Long]("n_customers")).sum).toMap
      assert(byScore.keySet == (1 to 5).toSet)
      assert(byScore.values.max - byScore.values.min <= 1, s"$axis quintiles balanced")
    }
    // label is a pure function of the three scores
    segs.foreach { r =>
      val (rs, fs, ms) =
        (r.getAs[Int]("r_score"), r.getAs[Int]("f_score"), r.getAs[Int]("m_score"))
      val want =
        if (rs >= 4 && fs >= 4 && ms >= 4) "champion"
        else if (rs <= 2 && fs >= 4) "at_risk"
        else if (rs >= 4 && fs <= 2) "new"
        else if (rs <= 2 && fs <= 2 && ms <= 2) "hibernating"
        else "core"
      assert(r.getAs[String]("label") == want)
    }
  }

  test("q225: EWMA matches a driver-side replay of the 8-term closed form") {
    val out = rows("q225_ewma_smoothing")
      .groupBy(_.getAs[String]("event_type")).view
      .mapValues(_.sortBy(_.getAs[java.sql.Timestamp]("day").getTime)).toMap
    assert(out.nonEmpty)
    out.foreach { case (_, series) =>
      val xs = series.map(_.getAs[Long]("n"))
      series.zipWithIndex.foreach { case (r, t) =>
        var num = BigInt(0); var den = BigInt(0)
        for (i <- 0 until 8 if t - i >= 0) {
          num += BigInt(xs(t - i)) * (1L << (7 - i))
          den += 1L << (7 - i)
        }
        assert(BigInt(r.getAs[Long]("ewma")) == num / den, s"ewma at t=$t")
        val err = r.getAs[Any]("forecast_abs_err")
        if (t == 0) assert(err == null, "no forecast before the first observation")
        else {
          val prevE = series(t - 1).getAs[Long]("ewma")
          assert(err == math.abs(xs(t) - prevE))
        }
      }
    }
  }

  test("q226: top-10 readout matches an exact driver-side HITS solve; round 5 is readout-stable") {
    val edges = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey")
      .join(graft.Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .select("o_custkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val scale = BigInt("1000000000000")

    def renorm(m: Map[Long, BigInt]): Map[Long, BigInt] = {
      val tot = m.values.sum
      m.view.mapValues(v => v * scale / tot).toMap
    }
    def halfRound(score: Map[Long, BigInt], byFrom: Map[Long, Array[Long]]): Map[Long, BigInt] =
      renorm(byFrom.toSeq.flatMap { case (from, tos) =>
        tos.map(t => t -> score(from))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap)

    val custToParts = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val partToCusts = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var hub: Map[Long, BigInt] = custToParts.keys.map(_ -> BigInt(1000000)).toMap
    var auth: Map[Long, BigInt] = Map.empty
    var snapshots = Vector.empty[(Map[Long, BigInt], Map[Long, BigInt])]
    for (_ <- 1 to 5) {
      auth = halfRound(hub, custToParts)
      hub = halfRound(auth, partToCusts)
      snapshots :+= ((auth, hub))
    }
    def top10(m: Map[Long, BigInt]): Seq[(Long, Long)] =
      m.toSeq.sortBy { case (k, s) => (-s, k) }.take(10)
        .map { case (k, s) => (k, (s / 1000000).toLong) }

    val (auth4, hub4) = snapshots(3)
    val (auth5, hub5) = snapshots(4)
    val got = rows("q226_hits_ranking")
    val gotAuth = got.filter(_.getAs[String]("side") == "authority").sortBy(_.getAs[Int]("rk"))
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("score_ppm"))).toSeq
    val gotHub = got.filter(_.getAs[String]("side") == "hub").sortBy(_.getAs[Int]("rk"))
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("score_ppm"))).toSeq
    assert(gotAuth == top10(auth4), "authority top-10 = exact round-4 solve")
    assert(gotHub == top10(hub4), "hub top-10 = exact round-4 solve")
    // fixed-budget contract: one more round doesn't reorder the readout keys
    assert(top10(auth5).map(_._1) == top10(auth4).map(_._1), "round-5 authority keys stable")
    assert(top10(hub5).map(_._1) == top10(hub4).map(_._1), "round-5 hub keys stable")
  }
}
