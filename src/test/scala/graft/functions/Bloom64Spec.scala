package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Unit-level guarantees of the portable Bloom filter: zero false
  * negatives (the structural property the q73 oracle equality rests
  * on), a false-positive rate consistent with the sizing formula, and
  * merge-order independence of the bitmap (what makes BloomAgg's
  * partial aggregation exact).
  */
class Bloom64Spec extends AnyFunSuite {

  private val M = 16384
  private val K = 6

  private def keys(seed: Long, n: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((rnd.nextLong().abs % (1L << 60), rnd.nextLong().abs % (1L << 60) | 1L))
  }

  test("no false negatives, FPR within sizing bound") {
    val inserted = keys(1L, 1000)
    val bits = new Array[Long](M / 64)
    inserted.foreach { case (h1, h2) => Bloom64.set(bits, h1, h2, M, K) }
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      bits.map(_.asInstanceOf[Any]))
    inserted.foreach { case (h1, h2) =>
      assert(Bloom64.mightContain(arr, h1, h2, M, K), "false negative")
    }
    val probes = keys(2L, 10000).filterNot(inserted.toSet)
    val fps = probes.count { case (h1, h2) => Bloom64.mightContain(arr, h1, h2, M, K) }
    // (1 - e^(-kn/m))^k ≈ 1e-3 at n=1000; allow generous slack
    assert(fps <= probes.size * 0.01, s"$fps false positives in ${probes.size}")
  }

  test("bitmap is merge-order independent (partial aggregation exactness)") {
    val ks = keys(3L, 500)
    val (a, b) = ks.splitAt(250)
    val seq1 = new Array[Long](M / 64)
    ks.foreach { case (h1, h2) => Bloom64.set(seq1, h1, h2, M, K) }
    val pa = new Array[Long](M / 64)
    val pb = new Array[Long](M / 64)
    a.foreach { case (h1, h2) => Bloom64.set(pa, h1, h2, M, K) }
    b.foreach { case (h1, h2) => Bloom64.set(pb, h1, h2, M, K) }
    val merged = BloomAgg(M, K).merge(pa, pb)
    assert(merged.sameElements(seq1))
  }
}
