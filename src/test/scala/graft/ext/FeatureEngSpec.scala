package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Driver-side recomputes for the feature-engineering tier: the
  * leave-one-out encoder (q227) against a naive per-row recompute,
  * and the isotonic fit (q228) against a CLASSIC sequential
  * pool-adjacent-violators run in exact BigInt rational arithmetic —
  * proving the relational minimax formulation IS the PAVA fit.
  */
class FeatureEngSpec extends SparkSpec {

  private def rows(name: String): Array[Row] =
    graft.SparkEntry.queries(name)(spark, sf).collect()

  test("q227: LOO encoding matches a per-row driver recompute; smoothing shrinks to the global mean") {
    val out = rows("q227_target_encoding")
    assert(out.nonEmpty)
    val bySeg = out.groupBy(_.getAs[String]("c_mktsegment"))
    val gN = BigInt(out.length)
    val gT = out.map(r => BigInt(r.getAs[Long]("t"))).sum
    bySeg.foreach { case (_, seg) =>
      val n = BigInt(seg.length)
      val tot = seg.map(r => BigInt(r.getAs[Long]("t"))).sum
      seg.foreach { r =>
        val t = BigInt(r.getAs[Long]("t"))
        val loo = r.getAs[Any]("loo_micro")
        if (n == 1) assert(loo == null, "singleton category has no LOO value")
        else assert(BigInt(loo.asInstanceOf[Long]) == (tot - t) * 1000000 / (n - 1))
        val smooth = BigInt(r.getAs[Long]("smooth_micro"))
        assert(smooth == ((tot - t) * gN + 10 * gT) * 1000000 / ((n - 1 + 10) * gN))
        // shrinkage: smoothed sits between the LOO value and the
        // global mean (within 1 micro of floor rounding per side)
        if (n > 1) {
          val looV = BigInt(loo.asInstanceOf[Long])
          val gMean = gT * 1000000 / gN
          val lo = looV.min(gMean) - 1
          val hi = looV.max(gMean) + 1
          assert(smooth >= lo && smooth <= hi, s"smooth=$smooth not in [$lo,$hi]")
        }
      }
    }
  }

  test("q228: relational minimax fit equals a sequential rational-arithmetic PAVA") {
    val out = rows("q228_isotonic_calibration").sortBy(_.getAs[Int]("bin"))
    assert(out.length > 1)
    // classic PAVA: pool adjacent violators left-to-right, in exact
    // rationals (conv, n) per pool
    case class Pool(conv: BigInt, n: BigInt) {
      def lt(o: Pool): Boolean = conv * o.n < o.conv * n
      def merge(o: Pool): Pool = Pool(conv + o.conv, n + o.n)
    }
    val stack = collection.mutable.ArrayBuffer.empty[(Pool, Int)] // (pool, width)
    out.foreach { r =>
      var cur = (Pool(BigInt(r.getAs[Long]("conv")), BigInt(r.getAs[Long]("n"))), 1)
      while (stack.nonEmpty && cur._1.lt(stack.last._1)) {
        val prev = stack.remove(stack.length - 1)
        cur = (prev._1.merge(cur._1), prev._2 + cur._2)
      }
      stack += cur
    }
    val expected = stack.flatMap { case (p, w) =>
      Seq.fill(w)(p.conv * 1000000 / p.n)
    }
    val got = out.map(r => BigInt(r.getAs[Long]("fit_micro")))
    assert(got.toSeq == expected.toSeq,
      s"minimax fit != sequential PAVA: $got vs $expected")
    // monotone non-decreasing by construction
    got.sliding(2).foreach { case Array(a, b) => assert(a <= b) ; case _ => }
    // raw rates must differ from the fit somewhere (the data is noisy
    // enough to need pooling) — otherwise this test is vacuous
    val raw = out.map(r => BigInt(r.getAs[Long]("raw_micro")))
    assert(raw.toSeq != got.toSeq, "fit == raw everywhere: pooling never engaged")
  }
}
