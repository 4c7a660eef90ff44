package graft.ext

import graft.{SparkEntry, SparkSpec}

/** q256: the moment-matrix contraction must equal the O(n²) pairwise
  * kernel definition — Σ_{x∈A,y∈B}(x·y)² == Σ_ij M^A_ij·M^B_ij — and
  * the registered query's floored-mean readout must match a BigInt
  * driver replay of exactly that definition for a real label pair.
  */
class MmdSpec extends SparkSpec {

  test("q256 floored-mean readout equals a BigInt pairwise-definition replay") {
    val rows = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    val dims = rows.head._3.length
    val mn = (0 until dims).map(d => rows.map(_._3(d)).min)
    val mx = (0 until dims).map(d => rows.map(_._3(d)).max)
    def codes(v: Array[Double]): Array[Long] = (0 until dims).map { d =>
      if (mx(d) == mn(d)) 0L
      else math.min(127L, math.max(-127L,
        math.floor((v(d) - mn(d)) * 254.0 / (mx(d) - mn(d))).toLong - 127L))
    }.toArray
    val byLabel = rows.groupBy(_._2).view.mapValues(_.map(t => codes(t._3))).toMap
    def dot(a: Array[Long], b: Array[Long]): BigInt =
      (0 until dims).map(d => BigInt(a(d)) * b(d)).sum
    // pairwise V-statistic sums (the definition)
    def sPair(as: Seq[Array[Long]], bs: Seq[Array[Long]]): BigInt =
      (for (x <- as; y <- bs) yield { val d = dot(x, y); d * d }).sum
    // moment-matrix contraction (the engine's plan)
    def moment(vs: Seq[Array[Long]]): Array[Array[BigInt]] = {
      val m = Array.fill(dims, dims)(BigInt(0))
      vs.foreach(v => for (i <- 0 until dims; j <- 0 until dims) m(i)(j) += BigInt(v(i)) * v(j))
      m
    }
    val (a, b) = (0, 1)
    val (va, vb) = (byLabel(a).toSeq, byLabel(b).toSeq)
    val (ma, mb) = (moment(va), moment(vb))
    def contract(x: Array[Array[BigInt]], y: Array[Array[BigInt]]): BigInt =
      (for (i <- 0 until dims; j <- 0 until dims) yield x(i)(j) * y(i)(j)).sum
    assert(contract(ma, mb) == sPair(va, vb), "contraction identity (cross term)")
    assert(contract(ma, ma) == sPair(va, va), "contraction identity (self term)")

    val (na, nb) = (BigInt(va.size), BigInt(vb.size))
    val expected = (
      (sPair(va, va) / (na * na)).toLong,
      (sPair(vb, vb) / (nb * nb)).toLong,
      (sPair(va, vb) / (na * nb)).toLong)
    val got = SparkEntry.queries("q256_mmd_two_sample")(spark, sf)
      .filter(s"a_label = $a AND b_label = $b").collect().head
    assert((got.getLong(4), got.getLong(5), got.getLong(6)) == expected)
    assert(got.getLong(7) == expected._1 + expected._2 - 2 * expected._3)
  }
}
