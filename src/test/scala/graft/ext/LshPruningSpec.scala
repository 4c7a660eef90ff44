package graft.ext

import graft.{SparkEntry, SparkSpec}

/** Pins q138's measured LSH pruning/recall trade-off (VERDICT r6
  * task 3): the scaladocs' "deep tables at a realistic threshold
  * prune hard" claim as ASSERTED numbers, not prose. Everything in
  * q138 is deterministic (md5-derived hyperplanes, fixed planted
  * twins), so these bounds are stable: at sf0.001 the measured values
  * are deep = 3,583 ppm of the pair space at 95.4% planted recall vs
  * shallow = 202,248 ppm at 99.8% — the bounds below leave margin for
  * nothing but a genuine behavior change.
  */
class LshPruningSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("q138_lsh_pruning")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap

  test("deep family candidates are <<n^2: at most 1% of the pair space") {
    val deep = rows("deep")
    val candPpm = deep.getLong(deep.fieldIndex("cand_ppm"))
    assert(candPpm <= 10000L, s"deep cand_ppm $candPpm exceeds 1% of pairs")
  }

  test("deep family still recalls >=90% of planted high-cosine twins") {
    val deep = rows("deep")
    val recall = deep.getLong(deep.fieldIndex("recall_cand_micro"))
    assert(recall >= 900000L, s"deep planted recall $recall below 90%")
  }

  test("deep family prunes >=10x harder than the shallow demo family") {
    val deep = rows("deep").getLong(rows("deep").fieldIndex("n_cand"))
    val shallow = rows("shallow").getLong(rows("shallow").fieldIndex("n_cand"))
    assert(deep * 10 <= shallow,
      s"deep=$deep shallow=$shallow: expected >=10x candidate reduction")
  }

  test("verification agrees: every verified planted pair was a candidate") {
    Seq("deep", "shallow").foreach { fam =>
      val r = rows(fam)
      val pv = r.getLong(r.fieldIndex("n_planted_verified"))
      val pc = r.getLong(r.fieldIndex("n_planted_cand"))
      val v = r.getLong(r.fieldIndex("n_verified"))
      assert(pv <= pc, s"$fam: planted_verified $pv > planted_cand $pc")
      assert(pv <= v, s"$fam: planted_verified $pv > verified $v")
    }
  }
}
