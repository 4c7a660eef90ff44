package graft.ext

import graft.{SparkEntry, SparkSpec}

/** q218: brute-force stump search over every candidate threshold,
  * exact BigInt scoring, independent of both engines' window SQL.
  */
class GiniSplitSpec extends SparkSpec {

  test("q218: top-5 splits match the brute-force stump search") {
    val rows = graft.Tables.lineitem(spark, sf)
      .selectExpr("CAST(l_quantity AS LONG) AS v", "CAST(l_returnflag = 'R' AS LONG) AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = rows.length.toLong
    val p = rows.map(_._2).sum
    val thresholds = rows.map(_._1).distinct.sorted.dropRight(1)
    def score(t: Long): (Long, Long, Long, Long, Long) = {
      val (l, r) = rows.partition(_._1 <= t)
      val (nl, posl) = (l.length.toLong, l.map(_._2).sum)
      val (nr, posr) = (r.length.toLong, r.map(_._2).sum)
      def side(pos: Long, nn: Long) =
        ((BigInt(pos) * pos + BigInt(nn - pos) * (nn - pos)) * 1000000 / nn).toLong
      (nl, posl, nr, posr, side(posl, nl) + side(posr, nr))
    }
    val expected = thresholds.map(t => (t, score(t)))
      .sortBy { case (t, (_, _, _, _, s)) => (-s, t) }.take(5)
    val got = SparkEntry.queries("q218_gini_split")(spark, sf).collect()
    assert(got.length == 5)
    got.zip(expected).zipWithIndex.foreach { case ((r, (t, (nl, posl, nr, posr, s))), i) =>
      assert(r.getInt(0) == i + 1)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6)) == ((t, nl, posl, nr, posr, s)), s"rank ${i + 1}")
    }
    // sanity: the class counts conserve and scores sit below the
    // perfect-separation ceiling n*10^6
    got.foreach { r =>
      assert(r.getLong(2) + r.getLong(4) == n && r.getLong(3) + r.getLong(5) == p)
      assert(r.getLong(6) < n * 1000000L)
    }
  }
}
