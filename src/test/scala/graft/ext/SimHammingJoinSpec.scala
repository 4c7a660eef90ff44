package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q229: the pigeonhole-blocked Hamming join must equal brute force
  * (losslessness — also enforced by the oracle hash gate, re-proven
  * here in-engine), and the band blocking must actually prune the
  * candidate space (the scale claim, measured).
  */
class SimHammingJoinSpec extends SparkSpec {

  test("q229: banded join ≡ brute force, and candidates ≪ pair space") {
    val out = graft.SparkEntry.queries("q229_simhash_hamming_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.nonEmpty, "no pairs at radius 3 — threshold regressed")
    out.foreach { case (a, b, d) => assert(a < b && d >= 0 && d <= 3) }

    // brute force over the same fingerprints
    val sh = Dedup.simhash60Frame(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, sa) <- sh; (idb, sbb) <- sh if ida < idb
      d = java.lang.Long.bitCount(sa ^ sbb) if d <= 3
    } yield (ida, idb, d)).toSet
    assert(out.toSet == brute, "banded join != brute force")

    // pruning power: pairs agreeing on >= 1 of the 4 bands
    val n = sh.length.toLong
    val pairSpace = n * (n - 1) / 2
    val candidates = (for {
      (ida, sa) <- sh; (idb, sbb) <- sh if ida < idb
      if (0 until 4).exists(k => ((sa >> (k * 15)) & 0x7FFF) == ((sbb >> (k * 15)) & 0x7FFF))
    } yield 1).size.toLong
    assert(candidates < pairSpace / 20,
      s"band blocking prunes <95%: $candidates of $pairSpace")
  }
}
