package graft.ext

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q261: the min-merged (state ⊕ delta) per-source MinHash signature
  * must equal the from-scratch signature — the sketch-mergeability
  * identity under the exact gate — and the full-outer merge must
  * pass through sources that exist on only one side (a source born
  * in the batch, a source with no batch docs — the latter occurs
  * naturally at sf0.001), with both directions pinned on planted
  * frames through the production
  * [[Dedup.sourceSignature]] path.
  */
class IncrementalMinhashSpec extends SparkSpec {

  test("q261 merged signature equals the from-scratch signature in-engine") {
    val scratch = Dedup.sourceSignature(
      graft.Tables.documents(spark, sf).select(col("source"), col("text")))
    val merged = SparkEntry.queries("q261_incremental_minhash")(spark, sf)
    assert(merged.exceptAll(scratch).isEmpty && scratch.exceptAll(merged).isEmpty,
      "min-merge must be indistinguishable from recompute")
    // non-vacuous: both splits actually contribute docs per source
    val bucket = graft.ext.TrainPrep.md5Bucket(col("doc_id"), 100)
    val split = graft.Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(sum(when(bucket >= 90, 1L).otherwise(0L)).as("batch"),
        sum(when(bucket < 90, 1L).otherwise(0L)).as("corpus"))
      .collect()
    assert(split.exists(r => r.getLong(1) > 0 && r.getLong(2) > 0),
      "fixture assumption: some source spans both splits (a real merge happens)")
  }

  test("one-sided sources pass through the full-outer merge unchanged") {
    import spark.implicits._
    val state = Seq(("a", "alpha beta gamma delta"), ("b", "one two three four"))
      .toDF("source", "text")
    val delta = Seq(("b", "five six seven eight"), ("c", "red green blue cyan"))
      .toDF("source", "text")
    val sSig = Dedup.sourceSignature(state)
    val dSig = Dedup.sourceSignature(delta)
    val merged = sSig.select(col("source") +: (0 until 8).map(k => col(s"mh$k").as(s"s$k")): _*)
      .join(dSig.select(col("source") +: (0 until 8).map(k => col(s"mh$k").as(s"d$k")): _*),
        Seq("source"), "full_outer")
      .select(col("source") +: (0 until 8).map(k => least(col(s"s$k"), col(s"d$k")).as(s"mh$k")): _*)
    val scratch = Dedup.sourceSignature(state.unionAll(delta))
    assert(merged.exceptAll(scratch).isEmpty && scratch.exceptAll(merged).isEmpty)
    // 'a' is state-only, 'c' is batch-born, 'b' is genuinely merged
    assert(merged.count() == 3)
  }
}
