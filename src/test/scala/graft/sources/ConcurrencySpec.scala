package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Optimistic concurrency on the manifest store
  * ([[ManifestSource.commitSnapshot]]): every DML verb records the
  * snapshot it read and commits compare-and-swap style — a moved
  * pointer triggers conflict CLASSIFICATION, not blind last-wins (the
  * round-11 gap: two racing writers would silently clobber the
  * VERSION pointer). Races are staged deterministically by letting
  * writer B run to completion and then committing writer A against
  * its stale base (`base = Some(m0)`), which is exactly the state an
  * interleaved execution reaches at A's commit point.
  *
  * Pins, in Delta's conflict taxonomy:
  *   1. disjoint-file ops REBASE — both writers' effects land;
  *   2. overlapping rewrites ABORT the loser cleanly, store intact
  *      (ConcurrentDeleteDelete class);
  *   3. a concurrent append the loser SHOULD HAVE SEEN (key bloom
  *      may contain its keys) aborts it (ConcurrentAppend class) —
  *      the skipping index doubling as the serializability test;
  *   4. the loser's orphaned data files are invisible to readers and
  *      vacuum-collectable.
  */
class ConcurrencySpec extends SparkSpec {

  private def freshStore(n: Long): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_occ").toString
    (1L to n).map(i => (i, i * 1000L, "A", i, i * 10L))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .repartitionByRange(4, col("ship_us"))
      .write.format("graft-manifest").option("path", root).mode("overwrite").save()
    root
  }

  private def snapshot(root: String): Set[Seq[Any]] =
    spark.read.format("graft-manifest").option("path", root).load()
      .collect().map(_.toSeq).toSet

  test("disjoint writers rebase: delete against a stale base keeps a racing merge's rows") {
    val root = freshStore(40L)
    try {
      val m0 = ManifestSource.resolveManifest(root, None)
      // writer B wins the race: inserts brand-new keys (new file only)
      ManifestSource.merge(spark, root, Seq((100L, 50000L, "N", 1L, 5L)))
      // writer A committed against m0: deletes keys disjoint from B's
      // insert — file-level disjoint + bloom-clean ⇒ REBASE
      val (_, _, dropped, _) =
        ManifestSource.deleteKeys(spark, root, Seq(7L, 23L), base = Some(m0))
      assert(dropped == 2L)
      val rows = snapshot(root)
      assert(rows.exists(_.head == 100L), "the racing merge's insert must survive the rebase")
      assert(!rows.exists(_.head == 7L) && !rows.exists(_.head == 23L),
        "the rebased delete must still apply")
      assert(rows.size == 40 - 2 + 1)
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("overlapping rewrites abort the loser cleanly, store intact") {
    val root = freshStore(40L)
    try {
      val m0 = ManifestSource.resolveManifest(root, None)
      // writer B rewrites the file holding ok=5
      ManifestSource.deleteKeys(spark, root, Seq(5L))
      val afterB = snapshot(root)
      // writer A updates ok=6 — same data file as 5 — against m0:
      // its rewrite set intersects B's ⇒ conflict, nothing committed
      val ex = intercept[ManifestSource.CommitConflictException] {
        ManifestSource.merge(spark, root, Seq((6L, 6000L, "U", 6L, 999L)),
          base = Some(m0))
      }
      assert(ex.getMessage.contains("concurrent rewrite"))
      assert(snapshot(root) == afterB, "a conflicted commit must not mutate the store")
      // the loser's orphaned rewrite files are unreferenced: vacuum
      // collects them and the surviving snapshot is untouched
      ManifestSource.vacuum(root)
      assert(snapshot(root) == afterB)
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("a concurrent append the merge should have seen aborts it (bloom as the test)") {
    val root = freshStore(40L)
    try {
      val m0 = ManifestSource.resolveManifest(root, None)
      // writer B appends a NEW row with key 500
      ManifestSource.merge(spark, root, Seq((500L, 70000L, "N", 1L, 5L)))
      val afterB = snapshot(root)
      // writer A merges key 500 against m0 — it classified 500 as an
      // INSERT (no file held it at m0), but B's append now does: the
      // new file's bloom flags the overlap ⇒ conflict, else the store
      // would end with two ok=500 rows
      val ex = intercept[ManifestSource.CommitConflictException] {
        ManifestSource.merge(spark, root, Seq((500L, 70000L, "X", 2L, 6L)),
          base = Some(m0))
      }
      assert(ex.getMessage.contains("conflicts"))
      assert(snapshot(root) == afterB)
      // and the SAME stale-base merge on a key B's append cannot
      // contain rebases fine
      val (_, _, ins, _) = ManifestSource.merge(spark, root,
        Seq((900L, 80000L, "Z", 1L, 1L)), base = Some(m0))
      assert(ins == 1)
      assert(snapshot(root).exists(_.head == 900L))
      assert(snapshot(root).exists(r => r.head == 500L && r(2) == "N"),
        "B's committed row must be untouched")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("two compactions race: the loser aborts") {
    val root = freshStore(40L)
    try {
      // B compacts first (from the base manifest)
      ManifestSource.compact(spark, root, targetRows = 20L)
      val afterB = snapshot(root)
      // A's identical compaction now reads inputs B already replaced
      val ex = intercept[ManifestSource.CommitConflictException] {
        ManifestSource.compact(spark, root, targetRows = 10L)
      }
      assert(ex.getMessage.contains("concurrent rewrite"))
      assert(snapshot(root) == afterB)
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("four truly parallel writers all land, retrying on classified conflicts") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val root = freshStore(40L)
    try {
      // the staged races above are deterministic; this drives REAL
      // thread interleavings through the commit lock — each writer
      // merges its own key range and retries when the optimistic
      // commit classifies a genuine overlap (a bloom hit against a
      // racer's fresh file, or a shared candidate rewrite); a retry
      // re-reads the moved pointer, so it must terminate
      val futures = (0 until 4).map { w =>
        Future {
          val rows = (1 to 5).map(i =>
            (1000L + w * 100 + i, 60000L + w * 1000 + i, s"W$w", 1L, 1L))
          var attempts = 0
          var done = false
          while (!done) {
            try { ManifestSource.merge(spark, root, rows); done = true }
            catch {
              case _: ManifestSource.CommitConflictException =>
                attempts += 1
                assert(attempts < 20, "conflict retry must converge")
            }
          }
        }
      }
      Await.result(Future.sequence(futures), 180.seconds)
      val got = snapshot(root)
      assert(got.size == 40 + 20, s"all four writers' inserts must land: ${got.size}")
      for (w <- 0 until 4; i <- 1 to 5)
        assert(got.exists(_.head == 1000L + w * 100 + i), s"missing writer $w row $i")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("cross-process CAS: racing committers with the JVM monitor bypassed — every commit lands, exactly one per transition") {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val root = freshStore(12L)
    try {
      // drive commitCore DIRECTLY (no commitLock.synchronized): only
      // the commit.lock token - an atomic Files.createFile, the
      // primitive that also holds across JVMs - serializes these.
      // Each "process" appends one fresh file (appends never
      // conflict), so without the token two committers could allocate
      // the same generation name from the same directory listing or
      // classify against the same current and drop a commit.
      val start = new java.util.concurrent.CountDownLatch(1)
      val futures = (0 until 8).map { w =>
        Future {
          val f = s"part-xp$w.csv"
          val bloom = new Array[Long](ManifestSource.BloomWords)
          val k = 5000L + w
          ManifestSource.bloomInsert(bloom, k)
          val pw = new java.io.PrintWriter(new java.io.File(root, f), "UTF-8")
          try pw.println(s"$k,${90000L + w},X,1,1") finally pw.close()
          val base = ManifestSource.resolveManifest(root, None)
          start.await()
          ManifestSource.commitCore(root, base, Set.empty,
            Seq(ManifestSource.FileEntry(f, 90000L + w, 90000L + w, 1L,
              Some(bloom), Some((1L, 1L)))),
            _ => None, op = "append")
        }
      }
      start.countDown()
      Await.result(Future.sequence(futures), 180.seconds)
      val rows = snapshot(root)
      assert(rows.size == 12 + 8, s"every racing commit must land, got ${rows.size}")
      for (w <- 0 until 8)
        assert(rows.exists(_.head == 5000L + w), s"missing committer $w's row")
      // one trunk line per commit, all generation names distinct
      val log = ManifestSource.readCommitLog(root)
      assert(log.size == 1 + 8, s"exactly one log line per commit, got ${log.size}")
      assert(log.distinct.size == log.size, "no two commits may share a generation name")
      assert(!new java.io.File(root, "commit.lock").exists(),
        "the token must be released after the last commit")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("a stale commit token (crashed holder) is stolen; a fresh one blocks until released") {
    val root = freshStore(12L)
    try {
      // a holder that died mid-commit: plant the token with an old
      // mtime - the next committer must steal it and proceed
      val token = new java.io.File(root, "commit.lock")
      assert(token.createNewFile())
      assert(token.setLastModified(
        System.currentTimeMillis() - ManifestSource.TokenStaleMs - 5000L))
      ManifestSource.merge(spark, root, Seq((100L, 50000L, "N", 1L, 5L)))
      assert(snapshot(root).exists(_.head == 100L),
        "the commit must steal the stale token and land")
      assert(!token.exists(), "the stealing committer must release the token")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("compaction rebases over a concurrent append: both effects land") {
    import spark.implicits._
    val root = freshStore(40L)
    try {
      // the append commits AFTER the compaction's read snapshot
      // (compact reads `from` = the base manifest), so at commit time
      // the pointer has moved — appends never conflict with a
      // compaction, the rebase keeps the new file next to the
      // compacted ones
      Seq((100L, 50000L, "N", 1L, 5L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
        .coalesce(1)
        .write.format("graft-manifest").option("path", root).mode("append").save()
      val (nIn, nOut, m) = ManifestSource.compact(spark, root, targetRows = 20L)
      assert(nIn == 4 && nOut == 2, s"4 base files -> 2 compacted: $nIn -> $nOut")
      val rows = snapshot(root)
      assert(rows.size == 41, "compacted rows + the concurrently-appended row")
      assert(rows.exists(_.head == 100L), "the append must survive the rebase")
      assert(ManifestSource.readManifest(root, m).size == 3,
        "final manifest = 2 compacted files + the appended file")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }
}
