package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q274's change feed ([[Layout.manifestChangeFeed]]) on a planted
  * store where every expected event is known exactly: a MERGE
  * generation (one update + one insert) and a retention generation
  * (whole-file drop + straddle rewrite), then CDC's defining replay
  * property — applying the emitted feed onto snapshot A reconstructs
  * each later snapshot row-for-row. Rows carried unchanged through a
  * rewrite (the straddle-kept rows, and the non-matched rows of the
  * merge-rewritten file) must emit NOTHING.
  */
class ManifestChangeFeedSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.select(col("ok"), col("ship_us"), col("flag"), col("qty"), col("price_cents"))
      .collect().map(_.toSeq).toSet

  private def snapshot(root: String, manifest: String): DataFrame =
    spark.read.format("graft-manifest").option("path", root)
      .option("manifest", manifest).load()

  /** Apply a change-feed frame onto a state set: remove deleted /
    * pre-updated keys, add inserted / post-updated rows.
    */
  private def apply(state: Set[Seq[Any]], feed: DataFrame): Set[Seq[Any]] = {
    val ev = feed.collect().map(r => r.getAs[String]("change_type") ->
      Seq[Any](r.getAs[Long]("ok"), r.getAs[Long]("ship_us"), r.getAs[String]("flag"),
        r.getAs[Long]("qty"), r.getAs[Long]("price_cents")))
    val removedKeys = ev.collect {
      case (ct, row) if ct == "delete" || ct == "update_preimage" => row.head
    }.toSet
    val added = ev.collect {
      case (ct, row) if ct == "insert" || ct == "update_postimage" => row
    }.toSet
    state.filterNot(r => removedKeys(r.head)) ++ added
  }

  test("planted chain: merge + retention generations emit exactly the known events") {
    import graft.sources.ManifestSource
    val root = java.nio.file.Files.createTempDirectory("graft_cdf_spec").toString
    try {
      import spark.implicits._
      val base = (1L to 8L)
        .map(i => (i, i * 1000L, "A", i, i * 10L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      base.repartitionByRange(2, col("ship_us"))
        .write.format("graft-manifest").option("path", root).mode("overwrite").save()
      val m0 = ManifestSource.resolveManifest(root, None)
      // MERGE generation: update ok=7, insert ok=100
      val (_, _, _, m1) = ManifestSource.merge(spark, root,
        Seq((7L, 7000L, "U", 7L, 140L), (100L, 9000L, "N", 1L, 5L)))
      // RETENTION generation: cutoff 4500 deletes ok 1..4
      ManifestSource.deleteBelow(spark, root, 4500L)
      val m2 = ManifestSource.resolveManifest(root, None)

      val feed1 = Layout.manifestChangeFeed(spark, root, m0, m1)
      val got1 = feed1.collect().map(_.toSeq).toSet
      assert(got1 == Set(
        Seq("update_preimage", 7L, 7000L, "A", 7L, 70L),
        Seq("update_postimage", 7L, 7000L, "U", 7L, 140L),
        Seq("insert", 100L, 9000L, "N", 1L, 5L)),
        s"merge generation events wrong: $got1")

      val feed2 = Layout.manifestChangeFeed(spark, root, m1, m2)
      val got2 = feed2.collect().map(_.toSeq).toSet
      assert(got2 == (1L to 4L).map(i =>
        Seq[Any]("delete", i, i * 1000L, "A", i, i * 10L)).toSet,
        s"retention generation events wrong: $got2")

      // replay: A + feed1 == B, then + feed2 == C
      val a = rows(snapshot(root, m0))
      val b = rows(snapshot(root, m1))
      val c = rows(snapshot(root, m2))
      assert(apply(a, feed1) == b, "replaying the merge feed onto A must yield B")
      assert(apply(b, feed2) == c, "replaying the retention feed onto B must yield C")

      // kept-by-reference sanity: the two snapshots of each diff DO
      // share files, so the feed's file-set pruning has something to
      // prune (the scale claim rests on this)
      val f0 = ManifestSource.readManifest(root, m0).map(_.file).toSet
      val f1 = ManifestSource.readManifest(root, m1).map(_.file).toSet
      assert((f0 & f1).nonEmpty, "merge must carry untouched files by reference")
    } finally {
      scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(root)))
    }
  }

  test("a compaction generation emits NOTHING; a net diff collapses intermediate churn") {
    import graft.sources.ManifestSource
    val root = java.nio.file.Files.createTempDirectory("graft_cdf_net").toString
    try {
      import spark.implicits._
      val base = (1L to 8L).map(i => (i, i * 1000L, "A", i, i * 10L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      base.repartitionByRange(4, col("ship_us"))
        .write.format("graft-manifest").option("path", root).mode("overwrite").save()
      val m0 = ManifestSource.resolveManifest(root, None)
      // compaction rewrites files but changes NO rows — the feed
      // across it must be empty (every row compares equal)
      ManifestSource.compact(spark, root, targetRows = 4L)
      val m1 = ManifestSource.resolveManifest(root, None)
      assert(m1 != m0, "compaction must commit a new generation")
      assert(Layout.manifestChangeFeed(spark, root, m0, m1).isEmpty,
        "a compaction generation must emit no change events")
      // churn: update ok=3 in gen2, then DELETE it in gen3 — the net
      // m1→m3 diff must collapse to a single delete of the ORIGINAL
      // row (the intermediate update image never existed at either
      // endpoint), plus gen2's surviving insert
      val (_, _, _, m2) = ManifestSource.merge(spark, root,
        Seq((3L, 3000L, "U", 3L, 60L), (100L, 9000L, "N", 1L, 5L)))
      val (_, _, _, m3) = ManifestSource.deleteKeys(spark, root, Seq(3L))
      val net = Layout.manifestChangeFeed(spark, root, m1, m3)
        .collect().map(_.toSeq).toSet
      assert(net == Set(
        Seq[Any]("delete", 3L, 3000L, "A", 3L, 30L),
        Seq[Any]("insert", 100L, 9000L, "N", 1L, 5L)),
        s"net diff must collapse update-then-delete: $net")
      // and the net feed still replays A → C exactly
      val a = rows(snapshot(root, m1))
      val c = rows(snapshot(root, m3))
      assert(apply(a, Layout.manifestChangeFeed(spark, root, m1, m3)) == c,
        "net-feed replay must reconstruct the final snapshot")
      assert(m2 != m3, "chain sanity")
    } finally {
      scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(root)))
    }
  }

  test("sf0.001 chain replay: the q274 feed reconstructs the final snapshot") {
    import graft.sources.ManifestSource
    // rebuild the q274 store (same tag convention) and replay its feed
    val out = graft.SparkEntry.queries("q274_manifest_change_feed")(spark, sf)
      .localCheckpoint()
    val tag = java.lang.Long.toHexString(sf.hashCode.toLong & 0xffffffffL)
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_manifest_cdf_$tag").getAbsolutePath
    val m2 = ManifestSource.resolveManifest(root, None)
    val a = rows(snapshot(root, "manifest.csv"))
    val c = rows(snapshot(root, m2))
    val replayed = apply(apply(a, out.filter(col("gen") === 1)),
      out.filter(col("gen") === 2))
    assert(replayed == c,
      s"replay drift: ${replayed.size} rows vs snapshot ${c.size}")
    assert(out.filter(col("gen") === 2 && col("change_type") === "delete").count() > 0,
      "retention generation must emit deletes at sf0.001")
  }
}
