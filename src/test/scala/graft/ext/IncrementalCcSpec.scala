package graft.ext

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q260: incremental cluster maintenance must EQUAL the from-scratch
  * recompute (q59) on the real corpus — the IVM correctness bar —
  * and the quotient-graph MERGE path (a batch doc bridging two
  * existing corpus clusters) must relabel both clusters to the
  * global min, which no SF of the driver corpus exercises naturally
  * (probed: zero bridging batch docs), so it runs on a planted
  * fixture through the production [[DupGraph.incrementalClusters]].
  */
class IncrementalCcSpec extends SparkSpec {

  test("q260 incremental assignment equals the from-scratch q59 recompute in-engine") {
    val inc = SparkEntry.queries("q260_incremental_dup_clusters")(spark, sf)
      .select(col("doc_id"), col("comp_id"), col("comp_size"))
    val scratch = SparkEntry.queries("q59_dup_clusters")(spark, sf)
    assert(inc.exceptAll(scratch).isEmpty && scratch.exceptAll(inc).isEmpty,
      "incremental must be indistinguishable from full recompute")
  }

  test("q260 exercises real cross-class edges on the corpus (not a vacuous split)") {
    val rows = SparkEntry.queries("q260_incremental_dup_clusters")(spark, sf).collect()
    val byOrigin = rows.groupBy(_.getString(3)).view.mapValues(_.length).toMap
    assert(byOrigin.getOrElse("batch", 0) > 0 && byOrigin.getOrElse("corpus", 0) > 0)
    // at least one MIXED cluster: a batch doc attached to a corpus
    // cluster (probed: 5 batch-corpus edges at sf0.001)
    val mixed = rows.groupBy(_.getLong(1))
      .exists(_._2.map(_.getString(3)).toSet == Set("batch", "corpus"))
    assert(mixed, "no batch doc joined a corpus cluster — the increment did nothing")
  }

  test("planted merge: a batch doc bridging two corpus clusters relabels both to the min") {
    import spark.implicits._
    val corpusAssign = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L), (8L, 8L))
      .toDF("doc_id", "comp_id")
    val batchDocs = Seq(100L, 101L, 102L).toDF("doc_id")
    val bb = Seq((100L, 101L)).toDF("a_id", "b_id")
    // 100 attaches to corpus doc 2 (cluster 1); 101 to corpus doc 5
    // (cluster 5) — through the 100-101 batch edge the two corpus
    // clusters MERGE and everything must carry the global min label 1
    val bc = Seq((100L, 2L), (101L, 5L)).toDF("batch_id", "corpus_id")
    val got = DupGraph.incrementalClusters(corpusAssign, batchDocs, bb, bc)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(1L) == ((1L, "corpus")) && got(2L) == ((1L, "corpus")))
    assert(got(5L) == ((1L, "corpus")) && got(6L) == ((1L, "corpus")),
      s"cluster 5 must merge into 1, got ${got(5L)}")
    assert(got(8L) == ((8L, "corpus")), "untouched corpus cluster must keep its label")
    assert(got(100L) == ((1L, "batch")) && got(101L) == ((1L, "batch")))
    assert(got(102L) == ((102L, "batch")), "edge-free batch doc is its own singleton")
  }
}
