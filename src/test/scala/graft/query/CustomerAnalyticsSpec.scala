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

  test("q232: Theil-Sen slope/intercept match a driver-side recompute; median is robust to one outlier month") {
    val out = rows("q232_theil_sen")
    assert(out.nonEmpty)
    // rebuild each nation's monthly series on the driver
    val orders = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .select("c_nationkey", "o_orderdate").collect()
    val series = orders.groupBy(_.getAs[Number]("c_nationkey").longValue).map { case (nk, rs) =>
      nk -> rs.groupBy { r =>
        val d = r.getAs[java.time.LocalDateTime]("o_orderdate")
        (d.getYear - 1995) * 12L + d.getMonthValue - 1
      }.view.mapValues(_.length.toLong).toMap
    }
    def medianOf(vals: Seq[BigInt]): BigInt = {
      val sorted = vals.sorted
      val n = sorted.length
      (sorted((n + 1) / 2 - 1) + sorted(n / 2)) / 2
    }
    out.foreach { r =>
      val nk = r.getAs[Int]("nationkey").toLong
      val s = series(nk)
      val ms = s.keys.toSeq.sorted
      val slopes = for (i <- ms.indices; j <- i + 1 until ms.length)
        yield BigInt((s(ms(j)) - s(ms(i))) * 1000000) / BigInt(ms(j) - ms(i))
      assert(r.getAs[Long]("n_pairs") == slopes.length.toLong)
      val slope = medianOf(slopes)
      assert(BigInt(r.getAs[Long]("slope_micro")) == slope, s"slope nation $nk")
      val resid = ms.map(m => BigInt(s(m)) * 1000000 - slope * m)
      assert(BigInt(r.getAs[Long]("intercept_micro")) == medianOf(resid), s"intercept nation $nk")
      assert(r.getAs[Long]("n_months") == ms.length.toLong)
    }
    // robustness, demonstrated: corrupt ONE month of the first series
    // by 100x and the pairwise-slope median barely moves, while the
    // OLS slope on the same corrupted series shifts by orders more
    val (nk0, s0) = series.head
    val ms = s0.keys.toSeq.sorted
    val corrupted = s0 + (ms(ms.length / 2) -> s0(ms(ms.length / 2)) * 100)
    def tsSlope(s: Map[Long, Long]): Double = {
      val m = s.keys.toSeq.sorted
      val sl = for (i <- m.indices; j <- i + 1 until m.length)
        yield (s(m(j)) - s(m(i))).toDouble / (m(j) - m(i))
      val v = sl.sorted; (v((v.length + 1) / 2 - 1) + v(v.length / 2)) / 2
    }
    def olsSlope(s: Map[Long, Long]): Double = {
      val n = s.size.toDouble
      val sx = s.keys.sum.toDouble; val sy = s.values.sum.toDouble
      val sxx = s.keys.map(m => m.toDouble * m).sum
      val sxy = s.map { case (m, y) => m.toDouble * y }.sum
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    val tsShift = math.abs(tsSlope(corrupted) - tsSlope(s0))
    val olsShift = math.abs(olsSlope(corrupted) - olsSlope(s0))
    assert(olsShift > 10 * tsShift,
      s"nation $nk0: expected OLS to be >>10x more sensitive (ts=$tsShift ols=$olsShift)")
  }

  test("q233: RA scores match brute force and ranking is total") {
    val out = rows("q233_link_prediction")
    assert(out.length == 50)
    val edges = graft.Tables.orders(spark, sf)
      .join(graft.Tables.lineitem(spark, sf),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .select("o_custkey", "l_partkey").distinct().collect()
      .map(r => (r.getAs[Number]("o_custkey").longValue, r.getAs[Number]("l_partkey").longValue))
    val deg = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val parts = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val custs = parts.keys.toSeq.sorted
    val brute = (for {
      i <- custs.indices; j <- i + 1 until custs.length
      shared = parts(custs(i)) & parts(custs(j)) if shared.nonEmpty
    } yield ((custs(i), custs(j)),
        (shared.size.toLong, shared.toSeq.map(p => 1000000000000L / deg(p)).sum))).toMap
    out.foreach { r =>
      val k = (r.getAs[Long]("ca"), r.getAs[Long]("cb"))
      val (cn, ra) = brute(k)
      assert(r.getAs[Long]("common_parts") == cn && r.getAs[Long]("ra_pico") == ra, s"pair $k")
    }
    // the emitted 50 are the global maxima under the total order
    val want = brute.toSeq
      .map { case ((a, b), (cn, ra)) => (ra, cn, a, b) }
      .sortBy { case (ra, cn, a, b) => (-ra, -cn, a, b) }.take(50)
    val got = out.map(r => (r.getAs[Long]("ra_pico"), r.getAs[Long]("common_parts"),
      r.getAs[Long]("ca"), r.getAs[Long]("cb"))).toSeq
    assert(got == want)
  }

  test("q248: backtest cells match a driver replay of both forecasters") {
    val out = rows("q248_forecast_backtest")
    assert(out.nonEmpty)
    // rebuild each type's daily series
    val daily = graft.Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.date_trunc("day",
          org.apache.spark.sql.functions.col("ts")).as("day"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
      .groupBy(_.getAs[String]("event_type")).view
      .mapValues(_.sortBy(_.getAs[java.sql.Timestamp]("day").getTime)
        .map(_.getAs[Long]("n")).toSeq).toMap
    out.foreach { r =>
      val series = daily(r.getAs[String]("event_type"))
      def ewma(t: Int): Long = {
        var num = 0L; var den = 0L
        for (i <- 0 until 8 if t - i >= 0) {
          num += series(t - i) * (1L << (7 - i)); den += 1L << (7 - i)
        }
        (num.toDouble / den).toLong
      }
      val origins = (8 until series.length).map { t =>
        (math.abs(series(t) - ewma(t - 1)), math.abs(series(t) - series(t - 1)))
      }
      assert(r.getAs[Long]("n_origins") == origins.length.toLong)
      assert(r.getAs[Long]("mae_model_micro") ==
        origins.map(_._1).sum * 1000000 / origins.length)
      assert(r.getAs[Long]("mae_naive_micro") ==
        origins.map(_._2).sum * 1000000 / origins.length)
      assert(r.getAs[Long]("wins_ppm") ==
        origins.count(o => o._1 < o._2).toLong * 1000000 / origins.length)
    }
  }

  test("q253: subgroup cells recombine to the q137 totals; uplift is the exact cross-multiplied difference") {
    val cells = rows("q253_uplift_segments")
    assert(cells.nonEmpty)
    cells.foreach { r =>
      val (na, ca, nb, cb) = (r.getAs[Long]("n_a"), r.getAs[Long]("conv_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("conv_b"))
      assert(ca <= na && cb <= nb)
      assert(BigInt(r.getAs[Long]("uplift_micro")) ==
        BigInt(cb * na - ca * nb) * 1000000 / (BigInt(na) * nb))
    }
    // subgroups partition the experiment population (q253 salts its
    // own arm split, so only the TOTAL population is comparable to
    // q137's readout; every event user joins a customer row here)
    val q137 = rows("q137_ab_experiment").head
    assert(cells.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum ==
      q137.getAs[Long]("n_a") + q137.getAs[Long]("n_b"))
  }
}
