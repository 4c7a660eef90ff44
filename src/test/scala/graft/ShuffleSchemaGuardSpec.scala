package graft

import graft.tools.ShuffleGuard

/** Shuffle-payload regression guard: the scaladocs' recurring 100 TB
  * claim — "digests through the shuffle, never bodies" — enforced as
  * CI, not prose. No registered batch query may plan an Exchange
  * whose input carries a raw document body or multimodal payload
  * attribute ([[ShuffleGuard.BannedAttrs]]); ids, digests, grams,
  * codes, and fixed-width embeddings are fine. At 100 TB the
  * difference is a shuffle measured in gigabytes versus the corpus
  * itself. The allowlist is EMPTY by design — the one historical
  * offender (q128's countDistinct over the body column, whose
  * partial-distinct ships every distinct string) was rewritten to
  * digest ndv rather than excused.
  */
class ShuffleSchemaGuardSpec extends SparkSpec {

  test("no batch query shuffles a raw body/payload column") {
    val streaming = graft.streaming.StreamingQueries.specs.map(_.name).toSet
    val offenders = SparkEntry.allSpecs
      .filterNot(s => streaming(s.name))
      .flatMap { spec =>
        val fmt = spec.fn(spark, sf).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val hits = ShuffleGuard.bodyShuffles(fmt)
        if (hits.nonEmpty) Some(spec.name -> hits) else None
      }
    assert(offenders.isEmpty,
      s"raw bodies crossing a shuffle (use digests/ids instead): $offenders")
  }
}
