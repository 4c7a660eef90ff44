package graft.ext

import graft.SparkSpec

/** q297's IVF fold off the live streaming CDF
  * ([[Similarity.q297Run]]): the abelian (count, code-sum) algebra
  * driven by the manifest source's own change-feed stream — nets the
  * CDF-lite carried pairs per commit, freezes centroids on the
  * bootstrap commit, subtracts net deletes and adds net inserts.
  * Must be TRIGGER-BATCHING INVARIANT: one commit per trigger equals
  * the whole history in one trigger, readout-identical. The fold ≡
  * rebuilt-index identity itself is the q297 tri-SF oracle gate
  * (q271's from-scratch SQL verbatim).
  */
class CdcIvfSpec extends SparkSpec {

  test("one commit per trigger == whole history in one trigger") {
    val perCommit = Similarity.q297Run(spark, sf, maxCommitsPerTrigger = 1)
      .collect().map(_.toSeq).toSeq
    val oneShot = Similarity.q297Run(spark, sf, maxCommitsPerTrigger = 99)
      .collect().map(_.toSeq).toSeq
    assert(perCommit == oneShot, "the CDF fold must be trigger-batching invariant")
    assert(perCommit.nonEmpty)
  }
}
