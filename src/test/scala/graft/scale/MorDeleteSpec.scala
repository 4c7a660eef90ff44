package graft.scale

import graft.SparkSpec
import graft.sources.{ManifestScan, ManifestSource}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merge-on-read deletion vectors ([[ManifestSource.deleteKeysMoR]] /
  * [[ManifestSource.rewriteDeletes]]) on a planted store where every
  * file's contents are known: 12 rows (ok = 1..12, ship_us = ok·1000)
  * range-written into 3 files, so ok 1–4 / 5–8 / 9–12 share a file.
  *
  * Pins the contract from q289's scaladoc:
  *   - the MoR commit is METADATA-ONLY (no data file written or
  *     changed) and the read masks rows exactly like a copy-on-write
  *     delete; time travel to the pre-delete pin reads originals;
  *   - masks STACK, and stats-answered aggregate pushdown REFUSES
  *     while any mask exists (physical stats are upper bounds),
  *     re-enabling after materialization;
  *   - [[ManifestSource.rewriteDeletes]] drops masked rows, keeps a
  *     zero-drop (bloom-false-positive) mask's file BY REFERENCE and
  *     clears its refs, removes a fully-masked file, and its
  *     generation emits an EMPTY change feed (live rows unchanged);
  *   - the change feed across a MoR generation emits exactly the
  *     masked rows as `delete` events (the file set stood still — the
  *     diff keys on (file, dv refs));
  *   - a MERGE over a masked store applies masks in its rewrites and
  *     RESURRECTS an update key whose target row is masked through
  *     the insert arm; retention straddler rewrites apply masks too;
  *   - vacuum keeps sidecars referenced by kept manifests and
  *     collects orphaned ones;
  *   - concurrency classes: two blind mask attaches COMMUTE; a mask
  *     attach aborts when its target file was rewritten concurrently;
  *     a copy-on-write rewrite aborts when a mask landed on its
  *     target concurrently; a mask attach rebases over a bloom-clean
  *     append and aborts on a bloom-hit one;
  *   - bin-pack [[ManifestSource.compact]] refuses masked inputs;
  *     [[ManifestSource.compactSorted]] reads through the source and
  *     materializes.
  */
class MorDeleteSpec extends SparkSpec {

  private def plant(): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mor").toString
    (1L to 12L).map(i => (i, i * 1000L, "A", i, i * 10L))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .repartitionByRange(3, col("ship_us"))
      .write.format("graft-manifest").option("path", root).mode("overwrite").save()
    root
  }

  private def load(root: String, pin: Option[String] = None): DataFrame = {
    val r = spark.read.format("graft-manifest").option("path", root)
    pin.fold(r)(m => r.option("manifest", m)).load()
  }

  private def keys(root: String, pin: Option[String] = None): Set[Long] =
    load(root, pin).select(col("ok")).collect().map(_.getLong(0)).toSet

  private def dataFileBytes(root: String): Map[String, Seq[Byte]] =
    new java.io.File(root).listFiles()
      .filter(f => f.getName.startsWith("part-") && !f.getName.startsWith("part-dv"))
      .map { f =>
        // data files are binary parquet since the columnar data plane:
        // compare raw bytes, not a UTF-8 decode
        f.getName -> java.nio.file.Files.readAllBytes(f.toPath).toSeq
      }.toMap

  private def dvMap(root: String): Map[String, Seq[String]] =
    ManifestSource.readDvMap(root, ManifestSource.resolveManifest(root, None))

  private def cleanup(root: String): Unit =
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))

  test("MoR delete is metadata-only; read masks exactly like CoW; time travel reads originals") {
    val root = plant()
    try {
      val m0 = ManifestSource.resolveManifest(root, None)
      val before = dataFileBytes(root)
      val (masked, total, dv, _) = ManifestSource.deleteKeysMoR(root, Seq(5L, 9L))
      assert(dv.isDefined && masked >= 2 && total == 3)
      // no data file was written, deleted, or changed — byte identity
      assert(dataFileBytes(root) == before,
        "a merge-on-read delete must not touch data files")
      assert(dvMap(root).nonEmpty)
      assert(keys(root) == (1L to 12L).toSet -- Set(5L, 9L))
      // pre-delete pin still reads every original row
      assert(keys(root, Some(m0)) == (1L to 12L).toSet)
    } finally cleanup(root)
  }

  test("masks stack across MoR generations; union equals one CoW delete") {
    val rootMor = plant()
    val rootCow = plant()
    try {
      ManifestSource.deleteKeysMoR(rootMor, Seq(5L))
      ManifestSource.deleteKeysMoR(rootMor, Seq(6L))
      // 5 and 6 share a file: its entry carries BOTH sidecar refs
      assert(dvMap(rootMor).values.exists(_.size >= 2),
        "a second MoR delete on the same file must stack, not replace")
      ManifestSource.deleteKeys(spark, rootCow, Seq(5L, 6L))
      val morRows = load(rootMor).collect().map(_.toSeq).toSet
      val cowRows = load(rootCow).collect().map(_.toSeq).toSet
      assert(morRows == cowRows, "merge-on-read must read exactly what copy-on-write wrote")
    } finally { cleanup(rootMor); cleanup(rootCow) }
  }

  test("stats-answered pushdown refuses under masks, re-enables exact after materialization") {
    val root = plant()
    try {
      ManifestSource.deleteKeysMoR(root, Seq(5L, 9L))
      val maskedCount = load(root).agg(count(lit(1))).head.getLong(0)
      assert(maskedCount == 10L)
      assert(ManifestScan.lastPlanned._1 > 0,
        "a masked snapshot must not answer COUNT from physical stats")
      val (rewritten, _, dropped, _) = ManifestSource.rewriteDeletes(spark, root)
      assert(rewritten >= 1 && dropped == 2L)
      assert(dvMap(root).isEmpty)
      val cleanCount = load(root).agg(count(lit(1))).head.getLong(0)
      assert(cleanCount == 10L)
      assert(ManifestScan.lastPlanned._1 == 0,
        "after materialization the stats-answered path must return (0 files opened)")
    } finally cleanup(root)
  }

  test("rewriteDeletes: fully-masked file leaves, partial file rewrites, FP mask clears in place") {
    val root = plant()
    try {
      // fully mask the 1-4 file, partially mask the 9-12 file
      ManifestSource.deleteKeysMoR(root, Seq(1L, 2L, 3L, 4L, 9L))
      // hunt a REAL bloom false positive against the 5-8 file so its
      // mask exists but matches no row (the zero-drop clear path)
      val cur = ManifestSource.resolveManifest(root, None)
      val mid = ManifestSource.readManifest(root, cur)
        .find(e => e.min <= 5000L && e.max >= 5000L).get
      val fp = (100L to 200000L).find(k =>
        mid.bloom.exists(ManifestSource.bloomMightContain(_, k))).get
      ManifestSource.deleteKeysMoR(root, Seq(fp))
      assert(dvMap(root).contains(mid.file))

      val preRows = load(root).collect().map(_.toSeq).toSet
      val (rewritten, cleared, dropped, mFin) = ManifestSource.rewriteDeletes(spark, root)
      assert(dropped == 5L)
      assert(cleared >= 1, "the false-positive mask must clear without a rewrite")
      assert(rewritten >= 1)
      assert(dvMap(root).isEmpty)
      val entries = ManifestSource.readManifest(root, mFin)
      assert(entries.map(_.rows).sum == 7L)
      assert(entries.forall(_.min >= 5000L),
        "the fully-masked 1-4 file must leave the manifest")
      assert(entries.exists(_.file == mid.file),
        "a zero-drop mask's file must be kept by reference")
      assert(load(root).collect().map(_.toSeq).toSet == preRows,
        "materialization must not change live rows")
    } finally cleanup(root)
  }

  test("change feed: MoR generation emits exactly the masked rows as deletes; materialization emits nothing") {
    val root = plant()
    try {
      val m0 = ManifestSource.resolveManifest(root, None)
      val (_, _, _, m1) = ManifestSource.deleteKeysMoR(root, Seq(5L, 9L))
      val feed1 = Layout.manifestChangeFeed(spark, root, m0, m1).collect()
      assert(feed1.length == 2)
      assert(feed1.forall(_.getAs[String]("change_type") == "delete"))
      assert(feed1.map(_.getAs[Long]("ok")).toSet == Set(5L, 9L))
      // original images ride the delete events
      assert(feed1.forall(r => r.getAs[Long]("ship_us") == r.getAs[Long]("ok") * 1000L))
      val (_, _, _, m2) = ManifestSource.rewriteDeletes(spark, root)
      assert(Layout.manifestChangeFeed(spark, root, m1, m2).isEmpty,
        "a materialization changes no live rows — its feed must be empty")
      // the net feed across both generations is the same two deletes
      val net = Layout.manifestChangeFeed(spark, root, m0, m2).collect()
      assert(net.map(r => (r.getAs[String]("change_type"), r.getAs[Long]("ok"))).toSet ==
        Set(("delete", 5L), ("delete", 9L)))
    } finally cleanup(root)
  }

  test("MERGE over a masked store: masks apply in rewrites, a masked update key resurrects via the insert arm") {
    val root = plant()
    try {
      ManifestSource.deleteKeysMoR(root, Seq(5L))
      // update 5 (masked → unmatched → INSERT) and 7 (live → UPDATE)
      ManifestSource.merge(spark, root,
        Seq((5L, 5000L, "U", 5L, 999L), (7L, 7000L, "V", 7L, 777L)))
      val rows = load(root).collect()
        .map(r => r.getLong(0) -> (r.getString(2), r.getLong(4))).toMap
      assert(rows.size == 12, "resurrect + update must land on exactly the 12 live keys")
      assert(rows(5L) == ("U", 999L), "a masked update key must resurrect with the source row")
      assert(rows(7L) == ("V", 777L))
      // the 5-8 file rewrote (7 matched there): its mask went with it
      assert(dvMap(root).isEmpty,
        "a rewrite that applied the mask physically must drop its refs")
    } finally cleanup(root)
  }

  test("retention straddler rewrite applies masks") {
    val root = plant()
    try {
      ManifestSource.deleteKeysMoR(root, Seq(6L))
      // cutoff 6500: the 1-4 file drops whole, the 5-8 file straddles
      // (5, 6 below; 6 also masked), 9-12 kept by reference
      ManifestSource.deleteBelow(spark, root, 6500L)
      assert(keys(root) == Set(7L, 8L, 9L, 10L, 11L, 12L))
      assert(dvMap(root).isEmpty,
        "the straddle rewrite applied the mask; its refs must not survive")
    } finally cleanup(root)
  }

  test("vacuum keeps sidecars referenced by kept manifests, collects orphaned ones") {
    val root = plant()
    try {
      val (_, _, dvOpt, m1) = ManifestSource.deleteKeysMoR(root, Seq(5L))
      val dv = dvOpt.get
      ManifestSource.rewriteDeletes(spark, root)
      // the masked generation is kept: its sidecar must survive and
      // the pinned read must still mask
      ManifestSource.vacuum(root, keep = Seq(m1))
      assert(new java.io.File(root, dv).exists(),
        "a sidecar referenced by a kept manifest must survive vacuum")
      assert(keys(root, Some(m1)) == (1L to 12L).toSet - 5L)
      // drop the keep: manifest and sidecar both collect
      ManifestSource.vacuum(root)
      assert(!new java.io.File(root, dv).exists(),
        "an orphaned sidecar must be vacuumed")
      assert(keys(root) == (1L to 12L).toSet - 5L)
    } finally cleanup(root)
  }

  test("an empty MoR key batch is rejected — it would invert candidate selection") {
    val root = plant()
    try {
      val before = ManifestSource.readCommitLog(root).size
      intercept[IllegalArgumentException] {
        ManifestSource.deleteKeysMoR(root, Nil)
      }
      assert(ManifestSource.readCommitLog(root).size == before,
        "a rejected empty delete must commit nothing")
      assert(ManifestSource.readDvMap(root,
        ManifestSource.resolveManifest(root, None)).isEmpty,
        "no spurious zero-key masks may attach")
    } finally cleanup(root)
  }

  test("two blind mask attaches commute: a stale-base MoR delete rebases, both masks land") {
    val root = plant()
    try {
      val m0 = ManifestSource.resolveManifest(root, None)
      ManifestSource.deleteKeysMoR(root, Seq(5L))
      // second writer read m0 — never saw the first mask; blind
      // attaches are set-union, so this must REBASE, not abort
      ManifestSource.deleteKeysMoR(root, Seq(9L), base = Some(m0))
      assert(keys(root) == (1L to 12L).toSet -- Set(5L, 9L))
    } finally cleanup(root)
  }

  test("a mask attach aborts when its target file was rewritten concurrently") {
    val root = plant()
    try {
      val m0 = ManifestSource.resolveManifest(root, None)
      ManifestSource.deleteKeys(spark, root, Seq(5L)) // rewrites the 5-8 file
      val after = keys(root)
      val ex = intercept[ManifestSource.CommitConflictException] {
        ManifestSource.deleteKeysMoR(root, Seq(6L), base = Some(m0))
      }
      assert(ex.getMessage.contains("deletion-vector target") ||
        ex.getMessage.contains("concurrent append"))
      assert(keys(root) == after, "a conflicted MoR delete must not mutate the store")
    } finally cleanup(root)
  }

  test("a copy-on-write rewrite aborts when a mask landed on its target concurrently") {
    val root = plant()
    try {
      val m0 = ManifestSource.resolveManifest(root, None)
      ManifestSource.deleteKeysMoR(root, Seq(5L)) // mask on the 5-8 file wins
      val after = load(root).collect().map(_.toSeq).toSet
      val ex = intercept[ManifestSource.CommitConflictException] {
        // merge staged against m0 rewrites the 5-8 file (ok=6) without
        // ever seeing the mask — committing would resurrect ok=5
        ManifestSource.merge(spark, root, Seq((6L, 6000L, "U", 6L, 666L)),
          base = Some(m0))
      }
      assert(ex.getMessage.contains("concurrent row-level delete"))
      assert(load(root).collect().map(_.toSeq).toSet == after)
    } finally cleanup(root)
  }

  test("a stale-base MoR delete rebases over a bloom-clean append, aborts on a bloom-hit one") {
    val root = plant()
    try {
      val m0 = ManifestSource.resolveManifest(root, None)
      // bloom-clean: the racing insert's file cannot contain ok=5
      ManifestSource.merge(spark, root, Seq((100L, 50000L, "N", 1L, 5L)))
      ManifestSource.deleteKeysMoR(root, Seq(5L), base = Some(m0))
      assert(keys(root) == ((1L to 12L).toSet - 5L) + 100L,
        "rebase must keep the racing insert and apply the mask")

      // bloom-hit: a racing insert of the SAME key the MoR delete
      // targets — the blind delete never probed that file: conflict
      val m1 = ManifestSource.resolveManifest(root, None)
      ManifestSource.merge(spark, root, Seq((200L, 60000L, "N", 2L, 6L)))
      val ex = intercept[ManifestSource.CommitConflictException] {
        ManifestSource.deleteKeysMoR(root, Seq(200L), base = Some(m1))
      }
      assert(ex.getMessage.contains("may contain delete keys"))
    } finally cleanup(root)
  }

  test("bin-pack compact refuses masked inputs; compactSorted reads through masks and materializes") {
    val root = plant()
    try {
      ManifestSource.deleteKeysMoR(root, Seq(5L, 9L))
      val cur = ManifestSource.resolveManifest(root, None)
      val ex = intercept[IllegalArgumentException] {
        ManifestSource.compact(spark, root, targetRows = 100L, from = cur)
      }
      assert(ex.getMessage.contains("deletion vectors"))
      val pre = load(root).collect().map(_.toSeq).toSet
      ManifestSource.compactSorted(spark, root, targetRows = 100L)
      assert(dvMap(root).isEmpty,
        "a sorted rewrite reads through the source — masks materialize")
      assert(load(root).collect().map(_.toSeq).toSet == pre)
    } finally cleanup(root)
  }
}
