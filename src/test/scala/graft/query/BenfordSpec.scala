package graft.query

import graft.{SparkEntry, SparkSpec}

/** q190 Benford audit: structural invariants of the ppm artifact. */
class BenfordSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("q190_benford_audit")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("all nine digits appear, counts conserve, shares sum to ~1e6") {
    assert(rows.map(_._1).toSeq == (1 to 9))
    val total = graft.Tables.lineitem(spark, sf).count()
    assert(rows.map(_._2).sum == total)
    val ppmSum = rows.map(_._3).sum
    assert(ppmSum <= 1000000 && ppmSum > 1000000 - 9, s"floored shares sum $ppmSum")
    // the Benford column carries the constants, not data
    assert(rows.map(_._4).sum == 999995L)
  }

  test("deviation column is consistent and flags the uniform synthetic data") {
    rows.foreach { case (_, _, obs, ben, dev) => assert(dev == math.abs(obs - ben)) }
    // uniform-ish synthetic prices are exactly what Benford screening
    // exists to flag: the audit must be loudly non-conforming here
    assert(rows.map(_._5).max > 50000, "synthetic data should deviate > 5pp on some digit")
  }
}
