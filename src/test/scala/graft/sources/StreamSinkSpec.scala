package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The manifest store as a NATIVE STREAMING SINK
  * ([[ManifestStreamingWrite]] — TableCapability.STREAMING_WRITE):
  * `writeStream.format("graft-manifest")` appends one trunk commit
  * per non-empty epoch through the same CAS gate as every batch
  * writer, recording the (queryId, epochId) transaction in the commit
  * log's 5th field. Pins:
  *   - a streamed store reads IDENTICAL to a batch-written one;
  *   - checkpoint restart resumes without replays or gaps;
  *   - a re-delivered epoch finds its txn in the ledger and commits
  *     NOTHING (orphan task files are deleted) — even after a
  *     compaction renamed every data file, which erases the old
  *     `batchtag` filename trick;
  *   - complete/truncate output modes are refused.
  */
class StreamSinkSpec extends SparkSpec {

  private def plantSrc(): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sink_src").toString
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

  /** Pipe the src store's stream into dst through the native sink. */
  private def pipe(src: String, dst: String, ck: String): Unit = {
    val q = spark.readStream.format("graft-manifest")
      .option("path", src).option("maxcommitspertrigger", 1)
      .load()
      .writeStream.format("graft-manifest")
      .option("path", dst)
      .option("checkpointLocation", ck)
      .start()
    try { q.processAllAvailable(); q.stop() }
    finally scala.util.Try(q.stop())
  }

  private def readAll(root: String): Set[Seq[Any]] =
    spark.read.format("graft-manifest").option("path", root).load()
      .collect().map(_.toSeq).toSet

  private def cleanup(paths: String*): Unit = paths.foreach(p =>
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(p))))

  test("table-to-table pipe: per-epoch commits, txn-ledgered, content identical to a batch write") {
    val src = plantSrc()
    val dst = java.nio.file.Files.createTempDirectory("graft_sink_dst").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_sink_ck").toString
    try {
      append(src, Seq((100L, 50000L, "N", 1L, 5L)))
      append(src, Seq((200L, 60000L, "N", 2L, 6L)))
      pipe(src, dst, ck)
      assert(readAll(dst) == readAll(src),
        "the streamed store must read identical to the source")
      val entries = ManifestSource.readCommitLogEntries(dst)
      val sa = entries.filter(_.op == "stream-append")
      assert(sa.size == 3, s"one commit per non-empty epoch, got ${entries.map(_.op)}")
      assert(sa.forall(_.txn.isDefined), "every streamed commit must carry its txn")
      assert(sa.map(_.txn.get).distinct.size == 3, "epochs must be distinct in the ledger")
      // batch-written twin reads the same
      val twin = java.nio.file.Files.createTempDirectory("graft_sink_twin").toString
      try {
        spark.read.format("graft-manifest").option("path", src).load()
          .write.format("graft-manifest").option("path", twin).mode("overwrite").save()
        assert(readAll(twin) == readAll(dst))
      } finally cleanup(twin)
    } finally cleanup(src, dst, ck)
  }

  test("checkpoint restart resumes — new commits stream, nothing replays") {
    val src = plantSrc()
    val dst = java.nio.file.Files.createTempDirectory("graft_sink_dst2").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_sink_ck2").toString
    try {
      pipe(src, dst, ck)
      assert(readAll(dst).size == 12)
      append(src, Seq((100L, 50000L, "N", 1L, 5L)))
      pipe(src, dst, ck) // restart from the same checkpoint
      assert(readAll(dst) == readAll(src),
        "restart must deliver exactly the new commit — no replay, no gap")
      assert(readAll(dst).size == 13)
    } finally cleanup(src, dst, ck)
  }

  test("a re-delivered epoch commits nothing and its orphan files are deleted — even after compaction") {
    import spark.implicits._
    val dst = java.nio.file.Files.createTempDirectory("graft_sink_dup").toString
    try {
      (1L to 4L).map(i => (i, i * 1000L, "A", i, i * 10L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
        .write.format("graft-manifest").option("path", dst).mode("overwrite").save()
      val w = new ManifestStreamingWrite(dst, "test-query-1", ManifestSource.BaseCols,
        Seq('L', 'L', 'S', 'L', 'L'))
      def fakeEpochFile(n: String, k: Long = 50L): FileCommitMessage = {
        val pw = new java.io.PrintWriter(new java.io.File(dst, n), "UTF-8")
        try pw.println(s"$k,${k * 1000},N,1,5") finally pw.close()
        val bloom = new Array[Long](ManifestSource.BloomWords)
        ManifestSource.bloomInsert(bloom, k)
        FileCommitMessage(n, k * 1000, k * 1000, 1L, ManifestSource.bloomHex(bloom), 1L, 5L)
      }
      w.commit(7L, Array(fakeEpochFile("part-w0-t1-sqtest-ep7.csv")))
      assert(readAll(dst).size == 5, "first delivery of epoch 7 commits")
      // a compaction renames every data file — the filename-based
      // batchtag dedup would now be blind; the log ledger is not
      ManifestSource.compact(spark, dst, targetRows = 100L)
      val before = ManifestSource.resolveManifest(dst, None)
      val dup = "part-w0-t2-sqtest-ep7.csv"
      w.commit(7L, Array(fakeEpochFile(dup)))
      assert(ManifestSource.resolveManifest(dst, None) == before,
        "the re-delivered epoch must not advance the snapshot pointer")
      assert(readAll(dst).size == 5, "the re-delivered epoch must not double rows")
      assert(!new java.io.File(dst, dup).exists(),
        "the duplicate epoch's orphan file must be deleted")
      // a different query's epoch 7 is a DIFFERENT transaction
      val w2 = new ManifestStreamingWrite(dst, "test-query-2", ManifestSource.BaseCols,
        Seq('L', 'L', 'S', 'L', 'L'))
      w2.commit(7L, Array(fakeEpochFile("part-w0-t1-sqother-ep7.csv", k = 60L)))
      assert(readAll(dst).size == 6, "another query's epoch is independent")
    } finally cleanup(dst)
  }

  test("complete/truncate output mode is refused") {
    import spark.implicits._
    val dst = java.nio.file.Files.createTempDirectory("graft_sink_cm").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_sink_cm_ck").toString
    try {
      val ex = intercept[Exception] {
        val q = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
          .groupBy(lit(1).as("ok")).agg(count(lit(1)).as("ship_us"))
          .select(col("ok").cast("long"), col("ship_us"), lit("A").as("flag"),
            lit(1L).as("qty"), lit(1L).as("price_cents"))
          .writeStream.format("graft-manifest")
          .option("path", dst)
          .option("checkpointLocation", ck)
          .outputMode("complete")
          .start()
        try q.processAllAvailable() finally scala.util.Try(q.stop())
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(m => m.contains("APPEND-ONLY") || m.contains("truncate") ||
          m.toLowerCase.contains("complete")),
        s"complete mode must be refused, got: ${msgs(ex)}")
    } finally cleanup(dst, ck)
  }
}
