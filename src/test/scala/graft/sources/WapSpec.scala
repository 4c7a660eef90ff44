package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Write–audit–publish branching
  * ([[ManifestSource.stageMerge]] / [[ManifestSource.publishBranch]]):
  * a staged generation is a BRANCH HEAD — fully written, readable via
  * the time-travel pin, invisible to every unpinned reader — and
  * publish is the standard optimistic commit over the file-set diff
  * recovered from the two manifests. Pins:
  *
  *   1. invisibility + audit + publish ≡ direct merge;
  *   2. the ABORT path: an unpublished branch vacuums away and the
  *      store is row-identical to never having staged;
  *   3. publish REBASES over a concurrent disjoint commit;
  *   4. publish ABORTS cleanly when a concurrent writer rewrote a
  *      file the branch also rewrote.
  */
class WapSpec extends SparkSpec {

  private def freshStore(n: Long): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wap").toString
    (1L to n).map(i => (i, i * 1000L, "A", i, i * 10L))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .repartitionByRange(4, col("ship_us"))
      .write.format("graft-manifest").option("path", root).mode("overwrite").save()
    root
  }

  private def rows(root: String, pin: Option[String] = None): Set[Seq[Any]] = {
    val r = spark.read.format("graft-manifest").option("path", root)
    pin.fold(r)(m => r.option("manifest", m)).load().collect().map(_.toSeq).toSet
  }

  private val batch = Seq((5L, 5000L, "U", 5L, 999L), (100L, 50000L, "N", 1L, 7L))

  test("staged branch is invisible, auditable via pin, and publish ≡ direct merge") {
    val rootA = freshStore(20L)
    val rootB = freshStore(20L)
    try {
      val before = rows(rootA)
      val (staged, base, nIns) = ManifestSource.stageMerge(spark, rootA, batch)
      assert(nIns == 1)
      assert(rows(rootA) == before, "unpublished branch must be invisible")
      val branch = rows(rootA, Some(staged))
      assert(branch.exists(r => r.head == 5L && r(2) == "U") &&
        branch.exists(_.head == 100L), "the pin must read the staged merge")
      ManifestSource.publishBranch(rootA, staged, base, batch.map(_._1))
      // reference: the same merge committed directly
      ManifestSource.merge(spark, rootB, batch)
      assert(rows(rootA) == rows(rootB), "publish must land exactly where a direct merge does")
    } finally Seq(rootA, rootB).foreach(r => scala.util.Try(
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(r))))
  }

  test("published WAP merge pairs CDF update images exactly like a direct merge") {
    val root = freshStore(12L)
    try {
      val (staged, base, _) = ManifestSource.stageMerge(spark, root, batch)
      assert(new java.io.File(root, s"wapupd-$staged.map").exists(),
        "stage must record its file→sidecar map for publish")
      // a kept (ref'd) in-audit branch survives vacuum WITH its
      // update-image sidecars
      ManifestSource.setRef(root, "audit", staged)
      ManifestSource.vacuum(root)
      assert(Option(new java.io.File(root).listFiles()).get
        .exists(_.getName.startsWith("updk-")),
        "a kept branch's sidecars must survive vacuum")
      ManifestSource.publishBranch(root, staged, base, batch.map(_._1))
      ManifestSource.dropRef(root, "audit")
      assert(!new java.io.File(root, s"wapupd-$staged.map").exists(),
        "publish consumes the map — the log's U: section owns the refs")
      val events = scala.collection.mutable.ArrayBuffer[(String, Long)]()
      val q = spark.readStream.format("graft-manifest")
        .option("path", root).option("readchangefeed", "true")
        .option("startingcommit", 1)
        .load().writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rs = b.collect().map(r =>
            (r.getAs[String]("_change_type"), r.getAs[Long]("ok")))
          events.synchronized { events ++= rs }
          ()
        }.start()
      try { q.processAllAvailable(); q.stop() } finally scala.util.Try(q.stop())
      assert(events.filter(_._1 == "update_preimage").map(_._2).toSet == Set(5L),
        "the published branch's matched key must pair as update_preimage")
      assert(events.filter(_._1 == "update_postimage").map(_._2).toSet == Set(5L))
      val del = events.filter(_._1 == "delete").map(_._2).toSet
      val ins = events.filter(_._1 == "insert").map(_._2).toSet
      assert(ins -- del == Set(100L), "churn cancels; the true insert survives")
      assert(!del.contains(5L) && !ins.contains(5L))
    } finally scala.util.Try(
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root)))
  }

  test("aborted branch: vacuum collects the update-image map and sidecars with the manifest") {
    val root = freshStore(12L)
    try {
      val (staged, _, _) = ManifestSource.stageMerge(spark, root, batch)
      assert(new java.io.File(root, s"wapupd-$staged.map").exists())
      ManifestSource.vacuum(root) // no ref, no keep: the abort verb
      val names = Option(new java.io.File(root).listFiles()).get.map(_.getName)
      assert(!names.exists(_.startsWith("wapupd-")),
        "the aborted branch's map must die with its manifest")
      assert(!names.exists(_.startsWith("updk-")),
        "the aborted branch's sidecars are unreferenced orphans")
    } finally scala.util.Try(
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root)))
  }

  test("abort: an unpublished branch vacuums away, store untouched") {
    val root = freshStore(20L)
    try {
      val before = rows(root)
      val filesBefore = new java.io.File(root).listFiles().map(_.getName).toSet
      val (staged, _, _) = ManifestSource.stageMerge(spark, root, batch)
      // audit failed — never publish; GC the branch
      val (deadM, deadD) = ManifestSource.vacuum(root)
      assert(deadM >= 1, "the staged manifest must be collected")
      assert(deadD >= 1, "the branch's exclusive data files must be collected")
      assert(rows(root) == before, "abort must leave the store row-identical")
      assert(new java.io.File(root).listFiles().map(_.getName).toSet == filesBefore,
        "abort + vacuum must restore the exact file set")
      assert(!new java.io.File(root, staged).exists())
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("publish rebases over a concurrent disjoint commit") {
    val root = freshStore(40L)
    try {
      // branch updates ok=5 (file 1) and inserts 100
      val (staged, base, _) = ManifestSource.stageMerge(spark, root, batch)
      // trunk moves: a concurrent delete in a DIFFERENT file,
      // bloom-disjoint from the branch's keys
      ManifestSource.deleteKeys(spark, root, Seq(33L))
      ManifestSource.publishBranch(root, staged, base, batch.map(_._1))
      val got = rows(root)
      assert(got.exists(r => r.head == 5L && r(2) == "U"), "branch update must land")
      assert(got.exists(_.head == 100L), "branch insert must land")
      assert(!got.exists(_.head == 33L), "the concurrent delete must survive the rebase")
      assert(got.size == 40 - 1 + 1)
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("publish aborts when the trunk's schema evolved after staging") {
    val root = freshStore(20L)
    try {
      val (staged, base, _) = ManifestSource.stageMerge(spark, root, batch)
      // a concurrent evolution commits: the branch's entries were
      // staged against the pre-evolution schema, so its positional
      // extras stats cannot be trusted against the new column —
      // publish must CONFLICT, never silently drop the column
      ManifestSource.addColumn(root, "disc")
      val afterTrunk = rows(root)
      val ex = intercept[ManifestSource.CommitConflictException] {
        ManifestSource.publishBranch(root, staged, base, batch.map(_._1))
      }
      assert(ex.getMessage.contains("schema evolution"))
      assert(rows(root) == afterTrunk)
      assert(ManifestSource.manifestSchema(root,
        ManifestSource.resolveManifest(root, None)) == ManifestSource.BaseCols :+ "disc",
        "the concurrently-added column must survive")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("publish aborts cleanly when the trunk rewrote a branch file") {
    val root = freshStore(40L)
    try {
      val (staged, base, _) = ManifestSource.stageMerge(spark, root, batch)
      // trunk rewrites the SAME file the branch rewrote (ok=6 sits
      // with ok=5)
      ManifestSource.deleteKeys(spark, root, Seq(6L))
      val afterTrunk = rows(root)
      val ex = intercept[ManifestSource.CommitConflictException] {
        ManifestSource.publishBranch(root, staged, base, batch.map(_._1))
      }
      assert(ex.getMessage.contains("concurrent rewrite"))
      assert(rows(root) == afterTrunk, "a conflicted publish must not mutate the store")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }
}
