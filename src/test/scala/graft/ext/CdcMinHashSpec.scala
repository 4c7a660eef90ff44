package graft.ext

import graft.SparkSpec

/** q292's MinHash event fold ([[StreamIngest.ingestMinHashFeed]]):
  * the semilattice sibling of the cluster/BM25 folds (min has no
  * inverse, so the stream drives q279/q286's replace-then-refold
  * discipline over the maintained doc-level sketch index). Must be
  * TRIGGER-BATCHING INVARIANT (events apply grouped by feed
  * generation within a trigger, drops before adds) and
  * COMPACTION-CADENCE INVARIANT (folding the index/signature stacks
  * changes no min). Both pinned in-engine on the real sf0.001 DML
  * chain by comparing whole readouts; the fold ≡ rebuilt-signature
  * identity itself is the q292 tri-SF oracle gate.
  */
class CdcMinHashSpec extends SparkSpec {

  test("per-generation triggers == whole feed in one trigger == eager compaction") {
    def run(filesPerTrigger: Int, compactEvery: Int): Seq[Seq[Any]] = {
      val (glob, stage, docs) = StreamIngest.stageDocChain(spark, sf, "mhspec_")
      try {
        val (out, nGens) =
          StreamIngest.ingestMinHashFeed(spark, glob, docs, filesPerTrigger, compactEvery)
        assert(nGens == 4, s"bootstrap + 3 feed generations, got $nGens")
        out.collect().map(_.toSeq).toSeq
      } finally scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(stage)))
    }
    val perGen = run(filesPerTrigger = 1, compactEvery = 99)
    val oneShot = run(filesPerTrigger = 3, compactEvery = 99)
    val compacted = run(filesPerTrigger = 1, compactEvery = 1)
    assert(perGen == oneShot, "fold must be trigger-batching invariant")
    assert(perGen == compacted, "stack compaction must change no min")
  }
}
