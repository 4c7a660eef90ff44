package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sort-based compaction ([[ManifestSource.compactSorted]]): after
  * DML degrades the layout — a MERGE's insert file spans the whole
  * clustering range — the re-cluster must provably RESTORE data
  * skipping (the same range predicate prunes to fewer candidate
  * files), while changing no row: row sets identical, the
  * pre-compaction snapshot still pinnable, and the change feed across
  * the compaction generation empty (the q245/q274 invariant).
  */
class SortedCompactionSpec extends SparkSpec {

  private def load(root: String, pin: Option[String] = None) = {
    val r = spark.read.format("graft-manifest").option("path", root)
    pin.fold(r)(m => r.option("manifest", m)).load()
  }

  private def rows(root: String, pin: Option[String] = None): Set[Seq[Any]] =
    load(root, pin).collect().map(_.toSeq).toSet

  /** Candidate files planned for a mid-range window predicate. */
  private def candidates(root: String): (Int, Int) = {
    load(root).filter(col("ship_us") >= 18000L && col("ship_us") < 22000L).count()
    ManifestScan.lastPlanned
  }

  test("re-cluster restores skipping, changes no row, emits no change event") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_srt").toString
    try {
      // 4 tiled files over ship_us 1000..40000
      (1L to 40L).map(i => (i, i * 1000L, "A", i, i * 10L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
        .repartitionByRange(4, col("ship_us"))
        .write.format("graft-manifest").option("path", root).mode("overwrite").save()
      // a MERGE whose inserts span the WHOLE range → one overlapping
      // file that every range scan must now open
      ManifestSource.merge(spark, root, Seq(
        (101L, 1500L, "N", 1L, 5L), (102L, 20500L, "N", 1L, 5L),
        (103L, 39500L, "N", 1L, 5L)))
      val mPre = ManifestSource.resolveManifest(root, None)
      val preRows = rows(root)
      val (preCand, preTotal) = candidates(root)
      assert(preCand >= 2,
        s"the spanning insert file must defeat pruning pre-compaction: $preCand/$preTotal")
      val (nIn, nOut, mPost) = ManifestSource.compactSorted(spark, root, targetRows = 11L)
      assert(nIn >= 5 && nOut == 4, s"expected 4 tiled outputs, got $nIn -> $nOut")
      // skipping restored: the same window now opens fewer files
      val (postCand, postTotal) = candidates(root)
      assert(postCand < preCand,
        s"sorted compaction must tighten zone maps: $preCand/$preTotal -> $postCand/$postTotal")
      // (not asserting ==1: range-partition boundaries are sampled, so
      // a window may legitimately straddle two adjacent tiles — the
      // guarantee is disjoint spans, pinned below, not boundary luck)
      // no row changed; old snapshot still pinnable; feed empty
      assert(rows(root) == preRows, "compaction must change no row")
      assert(rows(root, Some(mPre)) == preRows, "pre-compaction snapshot must stay pinnable")
      assert(graft.scale.Layout.manifestChangeFeed(spark, root, mPre, mPost).isEmpty,
        "a compaction generation must emit no change events")
      // outputs tile: zone spans are pairwise disjoint
      val spans = ManifestSource.readManifest(root, mPost).map(e => (e.min, e.max))
        .sortBy(_._1)
      spans.sliding(2).foreach {
        case Seq((_, aMax), (bMin, _)) =>
          assert(aMax <= bMin, s"outputs must tile the axis: $spans")
        case _ => ()
      }
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("sorted compaction carries extension columns and their stats") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_srt_evo").toString
    try {
      (1L to 8L).map(i => (i, i * 1000L, "A", i, i * 10L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
        .repartitionByRange(2, col("ship_us"))
        .write.format("graft-manifest").option("path", root).mode("overwrite").save()
      ManifestSource.addColumn(root, "disc")
      Seq((100L, 500L, "B", 1L, 10L, Some(7L)), (101L, 8500L, "B", 1L, 20L, None))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "disc")
        .coalesce(1)
        .write.format("graft-manifest").option("path", root).mode("append").save()
      val pre = rows(root)
      ManifestSource.compactSorted(spark, root, targetRows = 5L)
      assert(rows(root) == pre, "evolved rows must survive the re-sort byte-equal")
      // stats SUM over the extension column still answers exactly,
      // zero files opened, after the rewrite
      val s = load(root).agg(sum(col("disc"))).head.getLong(0)
      assert(s == 7L)
      assert(ManifestScan.lastPlanned._1 == 0, "still stats-answered post-compaction")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }
}
