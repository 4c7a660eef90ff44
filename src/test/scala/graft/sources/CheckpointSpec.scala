package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Commit-log checkpoint contract
  * ([[ManifestSource.checkpointCommitLog]]): the fold bounds
  * `commits.log` without changing any visible behavior EXCEPT
  * replayability of the folded range — which must fail loudly, never
  * silently mis-plan.
  */
class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_ckpt_$tag")
      .toFile.getAbsolutePath
    (1L to 40L).map(i => (i, i * 1000L, s"f$i", i, i * 10L))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .repartitionByRange(2, col("ship_us"))
      .write.format("graft-manifest").option("path", d).mode("overwrite").save()
    d
  }

  private def cleanup(root: String): Unit =
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))

  test("fold + truncate: base counts, log empties, history stays globally indexed") {
    val root = freshStore("h")
    try {
      ManifestSource.merge(spark, root, Seq((1L, 999L, "U", 9L, 9L)))
      ManifestSource.deleteKeys(spark, root, Seq(2L))
      val cp = ManifestSource.checkpointCommitLog(root)
      assert(cp.baseCommits == 3L)
      assert(ManifestSource.readCommitLogEntries(root).isEmpty)
      assert(ManifestSource.commitLogBase(root) == 3L)
      ManifestSource.merge(spark, root, Seq((3L, 888L, "V", 8L, 8L)))
      val h = ManifestSource.history(root)
      assert(h.map(_._1) == Seq(4L), s"global index survives the fold: $h")
      // a second fold composes: base accumulates
      val cp2 = ManifestSource.checkpointCommitLog(root)
      assert(cp2.baseCommits == 4L)
      // the table reads identically (39 rows: one deleted)
      assert(spark.read.format("graft-manifest").option("path", root)
        .load().count() == 39L)
    } finally cleanup(root)
  }

  test("asof: horizon resolves, pre-horizon fails loudly") {
    val root = freshStore("a")
    try {
      ManifestSource.merge(spark, root, Seq((1L, 999L, "U", 9L, 9L)))
      val cp = ManifestSource.checkpointCommitLog(root)
      assert(ManifestSource.resolveManifest(root, Some(s"asof:${cp.lastTs}"))
        == cp.lastManifest)
      val e = intercept[IllegalArgumentException](
        ManifestSource.resolveManifest(root, Some(s"asof:${cp.lastTs - 1}")))
      assert(e.getMessage.contains("checkpoint horizon"))
    } finally cleanup(root)
  }

  test("stream: offsets >= base replay; a pre-base offset fails with the remedy") {
    val root = freshStore("s")
    try {
      ManifestSource.merge(spark, root, Seq((41L, 41000L, "N", 1L, 1L)))
      val cp = ManifestSource.checkpointCommitLog(root)
      // post-checkpoint commit: the only replayable one
      (42L to 44L).map(i => (i, i * 1000L, s"g$i", i, i))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
        .write.format("graft-manifest").option("path", root).mode("append").save()
      def tail(from: Long) = {
        val ck = java.nio.file.Files.createTempDirectory("ckpt_stream").toString
        val q = spark.readStream.format("graft-manifest").option("path", root)
          .option("startingCommit", from.toString).load()
          .groupBy().agg(count(lit(1)).as("n"))
          .writeStream.format("memory").queryName(s"ckpt_t$from")
          .outputMode("complete").option("checkpointLocation", ck).start()
        try { q.processAllAvailable() } finally q.stop()
        spark.table(s"ckpt_t$from").collect().map(_.getLong(0)).headOption
      }
      assert(tail(cp.baseCommits).contains(3L),
        "streaming from the base replays exactly the post-fold commits")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        tail(0L).getOrElse(0L))
      assert(e.getMessage.contains("checkpoint") ||
        Option(e.getCause).exists(_.getMessage.contains("checkpoint")),
        s"pre-base offsets must fail with the checkpoint remedy: ${e.getMessage}")
    } finally cleanup(root)
  }

  test("txn ledger survives the fold: a re-delivered epoch still dedups") {
    val root = freshStore("t")
    try {
      val w = new ManifestStreamingWrite(root, "ckptQ", ManifestSource.BaseCols,
        Seq('L', 'L', 'S', 'L', 'L'))
      def epochFile(n: String, k: Long): FileCommitMessage = {
        val pw = new java.io.PrintWriter(new java.io.File(root, n), "UTF-8")
        try pw.println(s"$k,${k * 1000},N,1,5") finally pw.close()
        val bloom = new Array[Long](ManifestSource.BloomWords)
        ManifestSource.bloomInsert(bloom, k)
        FileCommitMessage(n, k * 1000, k * 1000, 1L,
          ManifestSource.bloomHex(bloom), 1L, 5L)
      }
      w.commit(7L, Array(epochFile("part-w0-t1-sqckptQ-ep7.csv", 50L)))
      val before = spark.read.format("graft-manifest").option("path", root)
        .load().count()
      ManifestSource.checkpointCommitLog(root)
      // replay of epoch 7 after the fold: the ledger snapshot must
      // still know it — nothing commits
      w.commit(7L, Array(epochFile("part-w0-t2-sqckptQ-ep7.csv", 51L)))
      assert(spark.read.format("graft-manifest").option("path", root)
        .load().count() == before,
        "a folded ledger must still dedup re-delivered epochs")
      // a NEW epoch still commits
      w.commit(8L, Array(epochFile("part-w0-t1-sqckptQ-ep8.csv", 52L)))
      assert(spark.read.format("graft-manifest").option("path", root)
        .load().count() == before + 1)
    } finally cleanup(root)
  }

  test("crash window self-heals: folded lines left in the log are dropped") {
    val root = freshStore("c")
    try {
      ManifestSource.merge(spark, root, Seq((1L, 999L, "U", 9L, 9L)))
      // snapshot the pre-fold log, checkpoint, then RESTORE the old
      // log bytes — simulating a crash between the two atomic moves
      val log = new java.io.File(root, "commits.log")
      val preFold = java.nio.file.Files.readAllBytes(log.toPath)
      val cp = ManifestSource.checkpointCommitLog(root)
      java.nio.file.Files.write(log.toPath, preFold)
      assert(ManifestSource.readCommitLogEntries(root).isEmpty,
        "lines up to the checkpoint's lastManifest are authoritatively folded")
      assert(ManifestSource.commitLogBase(root) == cp.baseCommits)
      // and the next commit appends cleanly after the healed view
      ManifestSource.merge(spark, root, Seq((3L, 888L, "V", 8L, 8L)))
      assert(ManifestSource.history(root).map(_._1) == Seq(3L),
        "the healed tail indexes after the folded base")
    } finally cleanup(root)
  }

  test("auto-checkpoint cadence: the log never grows past the declared N") {
    val root = freshStore("auto")
    try {
      ManifestSource.setCheckpointCadence(root, 5)
      var totalCommits = 1L // the create line
      (1 to 23).foreach { i =>
        ManifestSource.merge(spark, root, Seq((i.toLong, i * 7777L, "U", 1L, 1L)))
        totalCommits += 1
        // observed after EVERY commit: the in-log tail is bounded by N
        // (the fold fires inside the commit that reaches N)
        val tail = ManifestSource.readCommitLogEntries(root).size
        assert(tail < 5, s"after commit $i the log holds $tail lines (cadence 5)")
        assert(ManifestSource.commitLogBase(root) +
          tail == totalCommits, "base + tail must index every commit")
      }
      // history still globally indexed, table unchanged by the folds
      assert(spark.read.format("graft-manifest").option("path", root)
        .load().count() == 40L)
      // manual q307 verb still composes on top of the cadence (guard:
      // the cadence may have just emptied the tail — fold only a
      // nonempty one, the verb's own contract)
      ManifestSource.merge(spark, root, Seq((999L, 999999L, "Z", 1L, 1L)))
      totalCommits += 1
      if (ManifestSource.readCommitLogEntries(root).nonEmpty) {
        val cp = ManifestSource.checkpointCommitLog(root)
        assert(cp.baseCommits == totalCommits)
      } else assert(ManifestSource.commitLogBase(root) == totalCommits)
    } finally cleanup(root)
  }
}
