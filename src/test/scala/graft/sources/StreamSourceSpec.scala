package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The manifest table as a STREAMING SOURCE
  * ([[ManifestMicroBatchStream]] — offsets index the commit log,
  * batch (a, b] = each trunk commit's added files). Planted 12-row
  * store (ok = 1..12, 3 range files). Pins the q293 contract:
  *   - tailing from commit 0 with maxCommitsPerTrigger = 1 yields one
  *     batch per trunk commit with exactly that commit's added rows
  *     (the initial snapshot streams as the first inserts);
  *   - trigger batching is content-invariant (all-at-once == per
  *     commit as a multiset);
  *   - startingCommit skips history;
  *   - the APPEND-ONLY contract: a copy-on-write rewrite or a
  *     merge-on-read mask commit fails the stream loudly;
  *     `ignoreChanges=true` opts into Delta's re-emission semantics
  *     (a rewrite's output file re-emits its surviving rows; a
  *     mask-only commit emits nothing).
  */
class StreamSourceSpec extends SparkSpec {

  private def plant(): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_tail").toString
    (1L to 12L).map(i => (i, i * 1000L, "A", i, i * 10L))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .repartitionByRange(3, col("ship_us"))
      .write.format("graft-manifest").option("path", root).mode("overwrite").save()
    root
  }

  private def append(root: String, rows: Seq[(Long, Long, String, Long, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .coalesce(1)
      .write.format("graft-manifest").option("path", root).mode("append").save()
  }

  /** Run the stream to exhaustion, returning each micro-batch's ok
    * set in trigger order.
    */
  private def tail(root: String, opts: Map[String, String]): Seq[Set[Long]] = {
    val batches = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    var r = spark.readStream.format("graft-manifest").option("path", root)
    opts.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load().writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val ks = b.select(col("ok")).collect().map(_.getLong(0)).toSet
        batches.synchronized { if (ks.nonEmpty) batches += ks }
        ()
      }
      .start()
    try { q.processAllAvailable(); q.stop() }
    finally scala.util.Try(q.stop())
    batches.toSeq
  }

  private def cleanup(root: String): Unit =
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))

  test("per-commit batches: initial snapshot, then each append, exactly once") {
    val root = plant()
    try {
      append(root, Seq((100L, 50000L, "N", 1L, 5L)))
      append(root, Seq((200L, 60000L, "N", 2L, 6L), (201L, 61000L, "N", 2L, 7L)))
      val perCommit = tail(root, Map("maxcommitspertrigger" -> "1"))
      assert(perCommit == Seq((1L to 12L).toSet, Set(100L), Set(200L, 201L)),
        s"one batch per trunk commit with its added rows, got $perCommit")
      val oneShot = tail(root, Map())
      assert(oneShot.flatten.toSet == (1L to 12L).toSet ++ Set(100L, 200L, 201L))
      assert(oneShot.map(_.size).sum == 15, "batching must not duplicate or drop rows")
    } finally cleanup(root)
  }

  test("startingCommit skips history") {
    val root = plant()
    try {
      append(root, Seq((100L, 50000L, "N", 1L, 5L)))
      append(root, Seq((200L, 60000L, "N", 2L, 6L)))
      val fromSecond = tail(root,
        Map("startingcommit" -> "1", "maxcommitspertrigger" -> "1"))
      assert(fromSecond == Seq(Set(100L), Set(200L)),
        "startingCommit=1 must skip the initial snapshot")
    } finally cleanup(root)
  }

  test("append-only contract: a rewrite fails the stream; ignoreChanges re-emits survivors") {
    val root = plant()
    try {
      ManifestSource.deleteKeys(spark, root, Seq(5L)) // rewrites the 5-8 file
      val ex = intercept[Exception] { tail(root, Map()) }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("not an append")))
      // ignoreChanges: the delete commit's output file re-emits its
      // surviving rows 6,7,8 next to the initial snapshot
      val got = tail(root, Map("ignorechanges" -> "true",
        "maxcommitspertrigger" -> "1"))
      assert(got == Seq((1L to 12L).toSet, Set(6L, 7L, 8L)))
    } finally cleanup(root)
  }

  test("checkpoint restart: a second run resumes from the persisted offset — no replays, no gaps") {
    val root = plant()
    val ck = java.nio.file.Files.createTempDirectory("graft_tail_ck").toString
    try {
      append(root, Seq((100L, 50000L, "N", 1L, 5L)))
      val batches = scala.collection.mutable.ArrayBuffer[Set[Long]]()
      def runOnce(): Unit = {
        val q = spark.readStream.format("graft-manifest").option("path", root)
          .option("maxcommitspertrigger", "1")
          .load().writeStream
          .option("checkpointLocation", ck)
          .foreachBatch { (b: DataFrame, _: Long) =>
            val ks = b.select(col("ok")).collect().map(_.getLong(0)).toSet
            batches.synchronized { if (ks.nonEmpty) batches += ks }
            ()
          }.start()
        try { q.processAllAvailable(); q.stop() }
        finally scala.util.Try(q.stop())
      }
      runOnce() // consumes commits 1-2, offsets persist in the checkpoint
      assert(batches.toSeq == Seq((1L to 12L).toSet, Set(100L)))
      append(root, Seq((200L, 60000L, "N", 2L, 6L)))
      runOnce() // restart: deserializeOffset resumes PAST commit 2
      assert(batches.toSeq == Seq((1L to 12L).toSet, Set(100L), Set(200L)),
        "the restarted stream must emit only the new commit — no replay, no gap")
    } finally {
      cleanup(root)
      scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(ck)))
    }
  }

  test("CDF mode: delete-then-insert per commit replays the table; a mask-only commit nets to the masked row") {
    val root = plant()
    try {
      ManifestSource.merge(spark, root, Seq((5L, 5000L, "U", 5L, 999L))) // commit 2
      ManifestSource.deleteKeys(spark, root, Seq(9L)) // commit 3
      ManifestSource.deleteKeysMoR(root, Seq(10L)) // commit 4: mask only, no file moves
      val events = scala.collection.mutable.ArrayBuffer[(Long, String, Seq[Any])]()
      val q = spark.readStream.format("graft-manifest")
        .option("path", root).option("readchangefeed", "true")
        .load().writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          val rows = b.collect().map(r => (r.getAs[Long]("_commit"),
            r.getAs[String]("_change_type"),
            Seq[Any](r.getAs[Long]("ok"), r.getAs[Long]("ship_us"),
              r.getAs[String]("flag"), r.getAs[Long]("qty"),
              r.getAs[Long]("price_cents"))))
          events.synchronized { events ++= rows }
          ()
        }.start()
      try { q.processAllAvailable(); q.stop() } finally scala.util.Try(q.stop())
      // replay: per commit ascending, remove delete images then add
      // insert images — must land exactly on the live table. Update
      // images compose as delete+insert (a strict refinement).
      var state = Set.empty[Seq[Any]]
      events.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, evs) =>
        val dels = evs.filter(e => e._2 == "delete" || e._2 == "update_preimage")
          .map(_._3).toSet
        val inss = evs.filter(e => e._2 == "insert" || e._2 == "update_postimage")
          .map(_._3).toSet
        state = (state -- dels) ++ inss
      }
      val live = spark.read.format("graft-manifest").option("path", root)
        .load().collect().map(_.toSeq).toSet
      assert(state == live, "CDF replay must reconstruct the live table exactly")
      assert(!live.exists(_.head == 10L), "the mask must hold in the live read")
      // the mask-only commit's images net to exactly the masked row
      val c4 = events.filter(_._1 == 4L)
      val net = c4.filter(_._2 == "delete").map(_._3).toSet --
        c4.filter(_._2 == "insert").map(_._3).toSet
      assert(net.map(_.head) == Set(10L),
        "a mask-only commit must net to the masked row alone")
    } finally cleanup(root)
  }

  test("vacuum between commits no longer breaks the stream: planning is log-diff-driven") {
    val root = plant()
    val ck = java.nio.file.Files.createTempDirectory("graft_tail_vac_ck").toString
    try {
      val batches = scala.collection.mutable.ArrayBuffer[Set[Long]]()
      def runOnce(): Unit = {
        val q = spark.readStream.format("graft-manifest").option("path", root)
          .option("maxcommitspertrigger", "1")
          .load().writeStream
          .option("checkpointLocation", ck)
          .foreachBatch { (b: DataFrame, _: Long) =>
            val ks = b.select(col("ok")).collect().map(_.getLong(0)).toSet
            batches.synchronized { if (ks.nonEmpty) batches += ks }
            ()
          }.start()
        try { q.processAllAvailable(); q.stop() }
        finally scala.util.Try(q.stop())
      }
      runOnce() // consumes the initial snapshot (commit 1)
      append(root, Seq((100L, 50000L, "N", 1L, 5L))) // commit 2
      // routine maintenance: vacuum collects every non-current
      // generation manifest (commit 1's). Pre-round-13, planning batch
      // (1, 2] read commit 1's manifest by name for the file-set diff
      // and died with FileNotFoundException — the advertised 'table as
      // a stream' capability broke under normal maintenance. Planning
      // now reads the commit log's own file-diff field.
      val (dm, dd) = ManifestSource.vacuum(root)
      assert(dm >= 1, "fixture must actually vacuum a generation manifest")
      assert(dd == 0, "all data files are still referenced by current")
      runOnce() // restart past the vacuum: plans from the log alone
      assert(batches.toSeq == Seq((1L to 12L).toSet, Set(100L)),
        "the restarted stream must emit the post-vacuum commit — no replay, no crash")
    } finally {
      cleanup(root)
      scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(ck)))
    }
  }

  test("vacuumed DATA history fails planning with the named-ref remedy, not a bare file error") {
    val root = plant()
    try {
      // compact rewrites every initial file into one; vacuum then
      // collects the originals — commit 1's added files are GONE
      ManifestSource.compact(spark, root, targetRows = 100L)
      ManifestSource.vacuum(root)
      val ex = intercept[Exception] {
        tail(root, Map("ignorechanges" -> "true"))
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(m => m.contains("was vacuumed") && m.contains("named ref")),
        s"planning must name the vacuumed file and the remedy, got: ${msgs(ex)}")
      // tailing only the live suffix still works
      val got = tail(root, Map("startingcommit" -> "1", "ignorechanges" -> "true"))
      assert(got.flatten.toSet == (1L to 12L).toSet,
        "the compacted commit's file re-emits the full content")
    } finally cleanup(root)
  }

  /** Drain the change feed, returning (commit, change_type, row image). */
  private def collectCdf(root: String): Seq[(Long, String, Seq[Any])] = {
    val events = scala.collection.mutable.ArrayBuffer[(Long, String, Seq[Any])]()
    val q = spark.readStream.format("graft-manifest")
      .option("path", root).option("readchangefeed", "true")
      .load().writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.collect().map(r => (r.getAs[Long]("_commit"),
          r.getAs[String]("_change_type"),
          Seq[Any](r.getAs[Long]("ok"), r.getAs[Long]("ship_us"),
            r.getAs[String]("flag"), r.getAs[Long]("qty"),
            r.getAs[Long]("price_cents"))))
        events.synchronized { events ++= rows }
        ()
      }.start()
    try { q.processAllAvailable(); q.stop() } finally scala.util.Try(q.stop())
    events.toSeq
  }

  test("CDF update images (Seq merge): matched rows pair as preimage/postimage; churn and true inserts stay delete/insert") {
    val root = plant()
    try {
      ManifestSource.merge(spark, root,
        Seq((5L, 5000L, "U", 50L, 999L), (100L, 50000L, "N", 1L, 5L))) // commit 2
      val events = collectCdf(root).filter(_._1 == 2L)
      val pre = events.filter(_._2 == "update_preimage").map(_._3)
      val post = events.filter(_._2 == "update_postimage").map(_._3)
      assert(pre == Seq(Seq(5L, 5000L, "A", 5L, 50L)),
        s"exactly the matched row's OLD image as update_preimage, got $pre")
      assert(post == Seq(Seq(5L, 5000L, "U", 50L, 999L)),
        s"exactly the matched row's NEW image as update_postimage, got $post")
      val dels = events.filter(_._2 == "delete").map(_._3.head).toSet
      val inss = events.filter(_._2 == "insert").map(_._3.head).toSet
      assert(dels == Set(6L, 7L, 8L), "carried file churn stays delete")
      assert(inss == Set(6L, 7L, 8L, 100L),
        "churn cancels against its delete; the unmatched source row is a true insert")
      // the sidecar is log-owned metadata like commits.log: vacuum
      // must not collect it
      ManifestSource.vacuum(root)
      assert(Option(new java.io.File(root).listFiles()).get
        .exists(_.getName.startsWith("updk-")),
        "update-key sidecars must survive vacuum")
    } finally cleanup(root)
  }

  test("CDF update images (join-strategy mergeDF): distributed sidecars produce the same pairing") {
    import spark.implicits._
    val root = plant()
    try {
      val src = Seq((5L, 5000L, "U", 50L, 999L), (6L, 6000L, "V", 60L, 888L),
        (100L, 50000L, "N", 1L, 5L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      ManifestSource.mergeDF(spark, root, src) // commit 2
      val events = collectCdf(root).filter(_._1 == 2L)
      val pre = events.filter(_._2 == "update_preimage").map(_._3).toSet
      val post = events.filter(_._2 == "update_postimage").map(_._3).toSet
      assert(pre == Set(Seq(5L, 5000L, "A", 5L, 50L), Seq(6L, 6000L, "A", 6L, 60L)),
        s"both matched rows' OLD images as update_preimage, got $pre")
      assert(post == Set(Seq(5L, 5000L, "U", 50L, 999L), Seq(6L, 6000L, "V", 60L, 888L)),
        s"both matched rows' NEW images as update_postimage, got $post")
      val delKeys = events.filter(_._2 == "delete").map(_._3.head).toSet
      val insKeys = events.filter(_._2 == "insert").map(_._3.head).toSet
      // the DF path rewrites bloom-FP candidates too — churn varies,
      // but it must cancel exactly, never touch the matched keys, and
      // leave precisely the true insert
      assert(insKeys -- delKeys == Set(100L),
        s"churn must cancel leaving only the true insert, del=$delKeys ins=$insKeys")
      assert(delKeys -- insKeys == Set.empty[Long])
      assert((delKeys ++ insKeys).intersect(Set(5L, 6L)).isEmpty,
        "matched keys must never leak into delete/insert events")
      // refinement replay still reconstructs the live table
      var state = Set.empty[Seq[Any]]
      collectCdf(root).groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, evs) =>
        val d = evs.filter(e => e._2 == "delete" || e._2 == "update_preimage").map(_._3).toSet
        val i = evs.filter(e => e._2 == "insert" || e._2 == "update_postimage").map(_._3).toSet
        state = (state -- d) ++ i
      }
      val live = spark.read.format("graft-manifest").option("path", root)
        .load().collect().map(_.toSeq).toSet
      assert(state == live, "update-image replay must reconstruct the live table exactly")
    } finally cleanup(root)
  }

  test("a merge-on-read mask commit is flagged as non-append; ignoreChanges emits nothing for it") {
    val root = plant()
    try {
      ManifestSource.deleteKeysMoR(root, Seq(5L))
      val ex = intercept[Exception] { tail(root, Map()) }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("deletion-vector")))
      val got = tail(root, Map("ignorechanges" -> "true"))
      assert(got.flatten.toSet == (1L to 12L).toSet,
        "a mask-only commit adds no file — nothing re-emits")
    } finally cleanup(root)
  }
}
