package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AUTO-OPTIMIZE advisor ([[ManifestSource.adviseOptimize]] /
  * [[ManifestSource.autoOptimize]]): the layout-degradation verdict is
  * computed from the manifest's zone maps ALONE (stabbing depth over
  * the clustering axis). Pins:
  *   - a fresh range-tiled layout reads ~1.0 mean depth → no
  *     recommendation;
  *   - a MERGE whose insert file spans the axis degrades the store to
  *     ~2.0 → recommended;
  *   - [[ManifestSource.autoOptimize]] runs the sorted compaction
  *     exactly when recommended, content is unchanged, and the verb is
  *     idempotent (the re-tiled layout no longer recommends).
  */
class AutoOptimizeSpec extends SparkSpec {

  private def plant(): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_autoopt").toString
    (1L to 12L).map(i => (i, i * 1000L, "A", i, i * 10L))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .repartitionByRange(3, col("ship_us"))
      .write.format("graft-manifest").option("path", root).mode("overwrite").save()
    root
  }

  private def cleanup(root: String): Unit =
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))

  test("fresh tiled layout: depth 1.0, not recommended; DML degradation recommends; compaction restores") {
    val root = plant()
    try {
      val a0 = ManifestSource.adviseOptimize(root)
      assert(a0.maxDepth == 1 && math.abs(a0.avgDepth - 1.0) < 1e-9,
        s"3 disjoint tiles must read depth 1.0, got $a0")
      assert(!a0.recommend)

      // a MERGE with inserts at both ends of the axis: the insert file
      // [500, 12500] shadows every tile — the q284 disease
      ManifestSource.merge(spark, root, Seq(
        (5L, 5000L, "U", 50L, 999L),
        (100L, 500L, "N", 1L, 5L), (101L, 12500L, "N", 1L, 5L)))
      val a1 = ManifestSource.adviseOptimize(root)
      assert(a1.maxDepth >= 2 && a1.avgDepth > 1.5,
        s"an axis-spanning insert file must degrade mean depth past 1.5, got $a1")
      assert(a1.recommend)

      val before = spark.read.format("graft-manifest").option("path", root)
        .load().collect().map(_.toSeq).toSet
      val (advice, ran) = ManifestSource.autoOptimize(spark, root, targetRows = 5L)
      assert(advice.recommend && ran.isDefined,
        "autoOptimize must run the sorted compaction when recommended")
      val after = spark.read.format("graft-manifest").option("path", root)
        .load().collect().map(_.toSeq).toSet
      assert(after == before, "a compaction changes no rows")

      val a2 = ManifestSource.adviseOptimize(root)
      assert(!a2.recommend && math.abs(a2.avgDepth - 1.0) < 1e-9,
        s"the re-tiled layout must read depth 1.0 again, got $a2")
      val (_, ran2) = ManifestSource.autoOptimize(spark, root, targetRows = 5L)
      assert(ran2.isEmpty, "autoOptimize must be a metadata-only no-op once tiled")
    } finally cleanup(root)
  }

  test("small-file signal: fine tiling + tiny files recommends the bin-pack verb, not the re-sort") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_autoopt_sf").toString
    try {
      // 12 appends of one row each: perfect tiling (depth 1.0 — the
      // overlap advisor must stay silent), pathological file count
      (1L to 12L).foreach { i =>
        Seq((i, i * 1000L, "A", i, i * 10L))
          .toDF("ok", "ship_us", "flag", "qty", "price_cents")
          .coalesce(1)
          .write.format("graft-manifest").option("path", root)
          .mode(if (i == 1L) "overwrite" else "append").save()
      }
      val a = ManifestSource.adviseOptimize(root, targetRows = 4L)
      assert(math.abs(a.avgDepth - 1.0) < 1e-9 && !a.recommend,
        s"perfectly tiled appends must not trigger the re-sort, got $a")
      assert(a.smallFiles == 12 && a.recommendBinPack,
        s"12 one-row files under a 4-row target must recommend bin-pack, got $a")
      val before = spark.read.format("graft-manifest").option("path", root)
        .load().collect().map(_.toSeq).toSet
      val (advice, ran) = ManifestSource.autoOptimize(spark, root, targetRows = 4L)
      assert(!advice.recommend && advice.recommendBinPack && ran.isDefined)
      val after = spark.read.format("graft-manifest").option("path", root)
        .load().collect().map(_.toSeq).toSet
      assert(after == before, "a bin-pack changes no rows")
      val m = ManifestSource.resolveManifest(root, None)
      assert(ManifestSource.readManifest(root, m).size <= 3,
        "the bin-pack must coalesce the twelve files to the target bins")
      val (a2, ran2) = ManifestSource.autoOptimize(spark, root, targetRows = 4L)
      assert(ran2.isEmpty && !a2.recommendBinPack,
        "the packed layout must be a metadata-only no-op on the next poll")
    } finally cleanup(root)
  }

  test("small files under deletion-vector masks route to the re-sort verb (bin-pack refuses masks)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_autoopt_mor").toString
    try {
      (1L to 6L).foreach { i =>
        Seq((i, i * 1000L, "A", i, i * 10L))
          .toDF("ok", "ship_us", "flag", "qty", "price_cents")
          .coalesce(1)
          .write.format("graft-manifest").option("path", root)
          .mode(if (i == 1L) "overwrite" else "append").save()
      }
      ManifestSource.deleteKeysMoR(root, Seq(3L))
      val (advice, ran) = ManifestSource.autoOptimize(spark, root, targetRows = 4L)
      assert(advice.recommendBinPack && ran.isDefined)
      val m = ManifestSource.resolveManifest(root, None)
      assert(ManifestSource.readDvMap(root, m).isEmpty,
        "the re-sort path reads through the source, so the masks materialize")
      val live = spark.read.format("graft-manifest").option("path", root)
        .load().collect().map(_.getLong(0)).toSet
      assert(live == Set(1L, 2L, 4L, 5L, 6L), "the masked row stays deleted")
    } finally cleanup(root)
  }

  test("tiny and single-file stores never recommend") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_autoopt1").toString
    try {
      Seq((1L, 1000L, "A", 1L, 10L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
        .coalesce(1)
        .write.format("graft-manifest").option("path", root).mode("overwrite").save()
      val a = ManifestSource.adviseOptimize(root)
      assert(a.nFiles == 1 && !a.recommend)
    } finally cleanup(root)
  }
}
