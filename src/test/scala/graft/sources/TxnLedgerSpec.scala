package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Commit-log metadata stays O(1) as the log grows:
  *   - [[ManifestSource.lastLogLine]] reads the clamp source with a
  *     backwards seek, never the whole log;
  *   - the txn ledger ([[ManifestSource.txnLedger]]) is served from
  *     the incremental `txn-cache` (offset + per-query max epoch) and
  *     scans only the log tail the cache missed — a deleted cache
  *     rebuilds from offset 0, a STALE cache (crash between log
  *     append and cache write) under-reports and re-scans, never
  *     claims an epoch the log does not hold;
  *   - vacuum collects `updk-` update-image sidecars whose every
  *     referencing data file is gone (they can never be planned
  *     again) and keeps those with a live referencing file.
  */
class TxnLedgerSpec extends SparkSpec {

  private def plant(): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ledger").toString
    (1L to 12L).map(i => (i, i * 1000L, "A", i, i * 10L))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .repartitionByRange(3, col("ship_us"))
      .write.format("graft-manifest").option("path", root).mode("overwrite").save()
    root
  }

  private def cleanup(root: String): Unit =
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))

  test("lastLogLine returns the final line via backwards seek") {
    val root = plant()
    try {
      assert(ManifestSource.lastLogLine(root).exists(_.startsWith("manifest.csv,")))
      ManifestSource.merge(spark, root, Seq((5L, 5000L, "U", 5L, 9L)))
      val last = ManifestSource.lastLogLine(root).get
      assert(last.split(",")(2) == "merge", s"expected the merge line, got $last")
      assert(last == ManifestSource.readCommitLog(root).size.toString.take(0) +
        scala.io.Source.fromFile(new java.io.File(root, "commits.log"))
          .getLines().toSeq.last.trim)
    } finally cleanup(root)
  }

  test("txn ledger: cache tracks epochs incrementally; deletion and staleness both recover from the log") {
    val root = plant()
    try {
      val w = new ManifestStreamingWrite(root, "qA", ManifestSource.BaseCols,
        Seq('L', 'L', 'S', 'L', 'L'))
      def epochFile(n: String, k: Long): FileCommitMessage = {
        val pw = new java.io.PrintWriter(new java.io.File(root, n), "UTF-8")
        try pw.println(s"$k,${k * 1000},N,1,5") finally pw.close()
        val bloom = new Array[Long](ManifestSource.BloomWords)
        ManifestSource.bloomInsert(bloom, k)
        FileCommitMessage(n, k * 1000, k * 1000, 1L, ManifestSource.bloomHex(bloom), 1L, 5L)
      }
      w.commit(1L, Array(epochFile("part-w0-t1-sqqA-ep1.csv", 50L)))
      w.commit(2L, Array(epochFile("part-w0-t1-sqqA-ep2.csv", 51L)))
      assert(ManifestSource.txnLedger(root) == Map("qA" -> 2L))
      val cache = new java.io.File(root, "txn-cache")
      assert(cache.exists(), "every commit maintains the cache")
      // a batch DML commit between epochs keeps the cache current
      ManifestSource.merge(spark, root, Seq((5L, 5000L, "U", 5L, 9L)))
      assert(ManifestSource.txnLedger(root) == Map("qA" -> 2L))
      // deleted cache rebuilds from the log alone
      cache.delete()
      assert(ManifestSource.txnLedger(root) == Map("qA" -> 2L),
        "the log is the source of truth; the cache is derived")
      // STALE cache (simulated crash: offset too short) re-scans the
      // tail and still reports the committed epoch
      ManifestSource.merge(spark, root, Seq((6L, 6000L, "V", 6L, 9L)))
      val pw = new java.io.PrintWriter(cache, "UTF-8")
      try pw.println("offset=0") finally pw.close()
      assert(ManifestSource.txnLedger(root) == Map("qA" -> 2L))
      // dedup honors the ledger: re-delivered epochs 1 and 2 commit
      // nothing; epoch 3 commits
      val before = ManifestSource.resolveManifest(root, None)
      w.commit(2L, Array(epochFile("part-w0-t2-sqqA-ep2.csv", 52L)))
      w.commit(1L, Array(epochFile("part-w0-t2-sqqA-ep1.csv", 53L)))
      assert(ManifestSource.resolveManifest(root, None) == before)
      w.commit(3L, Array(epochFile("part-w0-t1-sqqA-ep3.csv", 54L)))
      assert(ManifestSource.txnLedger(root) == Map("qA" -> 3L))
      // truncate resets the ledger with the table
      import spark.implicits._
      Seq((1L, 1000L, "A", 1L, 10L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
        .write.format("graft-manifest").option("path", root).mode("overwrite").save()
      assert(ManifestSource.txnLedger(root).isEmpty,
        "a truncated table has no committed epochs")
    } finally cleanup(root)
  }

  test("vacuum collects updk- sidecars only once every referencing file is gone") {
    val root = plant()
    try {
      ManifestSource.merge(spark, root, Seq((5L, 5000L, "U", 50L, 999L)))
      def updFiles() = Option(new java.io.File(root).listFiles()).get
        .map(_.getName).filter(_.startsWith("updk-")).toSet
      assert(updFiles().nonEmpty, "the merge writes an update-image sidecar")
      // first vacuum: the rewritten output file still references the
      // sidecar — it must survive (its CDF partition loads it)
      ManifestSource.vacuum(root)
      assert(updFiles().nonEmpty, "a sidecar with a live referencing file survives")
      // rewrite the referencing file away (CoW delete of its rows),
      // then vacuum: now EVERY referencing file is gone — collected
      ManifestSource.deleteKeys(spark, root, (1L to 12L) :+ 100L)
      ManifestSource.vacuum(root)
      assert(updFiles().isEmpty,
        "a sidecar with no surviving referencing file is dead metadata")
    } finally cleanup(root)
  }
}
