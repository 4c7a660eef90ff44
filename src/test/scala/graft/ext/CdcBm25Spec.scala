package graft.ext

import graft.SparkSpec

/** q288's BM25 event fold ([[StreamIngest.ingestBm25Feed]]): the
  * abelian sibling of the cluster fold must be TRIGGER-BATCHING
  * INVARIANT (events apply grouped by feed generation within a
  * trigger, subtract before add) and COMPACTION-CADENCE INVARIANT
  * (folding the postings/dl stacks changes no score). Both pinned
  * in-engine on the real sf0.001 DML chain by comparing whole
  * readouts; the fold ≡ rebuilt-index identity itself is the q288
  * tri-SF oracle gate.
  */
class CdcBm25Spec extends SparkSpec {

  test("per-generation triggers == whole feed in one trigger == eager compaction") {
    def run(filesPerTrigger: Int, compactEvery: Int): Seq[Seq[Any]] = {
      val (glob, stage, docs) = StreamIngest.stageDocChain(spark, sf, "bm25spec_")
      try {
        val (out, nGens) =
          StreamIngest.ingestBm25Feed(spark, glob, docs, filesPerTrigger, compactEvery)
        assert(nGens == 4, s"bootstrap + 3 feed generations, got $nGens")
        out.collect().map(_.toSeq).toSeq
      } finally scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(stage)))
    }
    val perGen = run(filesPerTrigger = 1, compactEvery = 99)
    val oneShot = run(filesPerTrigger = 3, compactEvery = 99)
    val compacted = run(filesPerTrigger = 1, compactEvery = 1)
    assert(perGen == oneShot, "fold must be trigger-batching invariant")
    assert(perGen == compacted, "stack compaction must change no score")
  }
}
