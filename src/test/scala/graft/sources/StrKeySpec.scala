package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** STRING-KEYED STORE VARIANT ([[ManifestSource.keyCol]] = `flag`,
  * declared once via the truncate write's `keycol` option): blooms
  * index [[ManifestSource.strKeyHash]] of the string key, deletion-
  * vector sidecars carry raw keys behind a `#key:flag` header, and
  * the `*Str` DML verbs apply. Pins:
  *   - mergeStr updates matched rows by RAW key and inserts the rest;
  *     bloom candidate pruning holds (a one-key merge rewrites one
  *     file);
  *   - deleteKeysStrMoR masks at read time; rewriteDeletes
  *     materializes string masks physically;
  *   - compactSorted on a keyed store rebuilds KEYED blooms (pruning
  *     still holds after re-clustering);
  *   - key identity is immutable table metadata: Long verbs refuse a
  *     keyed store, string verbs refuse a plain store, appends and
  *     shallow clones inherit it.
  */
class StrKeySpec extends SparkSpec {

  /** 12 rows, keys d01..d12, 3 range-tiled files. */
  private def plant(): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_strkey").toString
    (1L to 12L).map(i => (i, i * 1000L, f"d$i%02d", i, i * 10L))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .repartitionByRange(3, col("ship_us"))
      .write.format("graft-manifest").option("path", root)
      .option("keycol", "flag").mode("overwrite").save()
    root
  }

  private def readAll(root: String): Set[(Long, Long, String, Long, Long)] =
    spark.read.format("graft-manifest").option("path", root).load()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet

  private def cleanup(root: String): Unit =
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))

  test("mergeStr: update by raw string key + insert; bloom pruning rewrites one file") {
    val root = plant()
    try {
      assert(ManifestSource.keyCol(root).contains("flag"))
      val (rewritten, kept, inserted, _) = ManifestSource.mergeStr(spark, root, Seq(
        ("d05", 5L, 5000L, 50L, 999L),   // matched: update in place
        ("x99", 100L, 50000L, 1L, 5L)))  // unmatched: insert
      assert(rewritten == 1, s"one key must rewrite exactly its bloom file, got $rewritten")
      assert(kept == 2 && inserted == 1)
      val all = readAll(root)
      assert(all.contains((5L, 5000L, "d05", 50L, 999L)), "matched row takes source values")
      assert(all.contains((100L, 50000L, "x99", 1L, 5L)), "unmatched key inserts")
      assert(all.size == 13)
    } finally cleanup(root)
  }

  test("deleteKeysStrMoR masks at read; rewriteDeletes materializes string masks") {
    val root = plant()
    try {
      val (masked, total, sidecar, _) =
        ManifestSource.deleteKeysStrMoR(root, Seq("d03", "d07"))
      assert(sidecar.isDefined && masked >= 1 && total == 3)
      val live = readAll(root)
      assert(!live.exists(r => r._3 == "d03" || r._3 == "d07"),
        "string-masked rows must vanish from the live read")
      assert(live.size == 10)
      val (rw, _, dropped, _) = ManifestSource.rewriteDeletes(spark, root)
      assert(dropped == 2, s"materialization must drop exactly the masked rows, got $dropped")
      assert(rw >= 1)
      assert(readAll(root) == live, "materialization changes no live row")
      assert(ManifestSource.readDvMap(root,
        ManifestSource.resolveManifest(root, None)).isEmpty)
    } finally cleanup(root)
  }

  test("compactSorted rebuilds KEYED blooms: pruning still holds after re-clustering") {
    val root = plant()
    try {
      ManifestSource.compactSorted(spark, root, targetRows = 4L)
      val (rewritten, _, _, _) = ManifestSource.mergeStr(spark, root,
        Seq(("d05", 5L, 5000L, 50L, 999L)))
      assert(rewritten == 1,
        "post-compaction blooms must still prune string-key candidates to one file")
      assert(readAll(root).contains((5L, 5000L, "d05", 50L, 999L)))
    } finally cleanup(root)
  }

  test("join-strategy string DML: mergeStrDF updates+inserts, deleteKeysStrDF and MoRDF delete by raw key") {
    import spark.implicits._
    val root = plant()
    try {
      val src = Seq(
        ("d05", 5L, 5000L, 50L, 999L),   // matched: update
        ("d06", 6L, 6000L, 60L, 888L),   // matched: update
        ("x99", 100L, 50000L, 1L, 5L))   // unmatched: insert
        .map { case (k, ok, us, q, pc) => (ok, us, k, q, pc) }
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      ManifestSource.mergeStrDF(spark, root, src)
      val all = readAll(root)
      assert(all.contains((5L, 5000L, "d05", 50L, 999L)))
      assert(all.contains((6L, 6000L, "d06", 60L, 888L)))
      assert(all.contains((100L, 50000L, "x99", 1L, 5L)))
      assert(all.size == 13)
      // CoW DF delete by raw key
      ManifestSource.deleteKeysStrDF(spark, root, Seq("d01", "d05").toDF("flag"))
      val afterCow = readAll(root)
      assert(!afterCow.exists(r => r._3 == "d01" || r._3 == "d05"))
      assert(afterCow.size == 11)
      // MoR DF delete: executor-built #key:flag sidecars, masks at read
      ManifestSource.deleteKeysStrMoRDF(spark, root, Seq("d02", "x99").toDF("flag"))
      val afterMor = readAll(root)
      assert(!afterMor.exists(r => r._3 == "d02" || r._3 == "x99"))
      assert(afterMor.size == 9)
      val (_, _, dropped, _) = ManifestSource.rewriteDeletes(spark, root)
      assert(dropped == 2 && readAll(root) == afterMor)
    } finally cleanup(root)
  }

  test("CDF update images on the string DF path: preimage/postimage pair by raw key") {
    import spark.implicits._
    val root = plant()
    try {
      val src = Seq((5L, 5000L, "d05", 50L, 999L), (100L, 50000L, "x99", 1L, 5L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      ManifestSource.mergeStrDF(spark, root, src) // commit 2
      val events = scala.collection.mutable.ArrayBuffer[(Long, String, Seq[Any])]()
      val q = spark.readStream.format("graft-manifest")
        .option("path", root).option("readchangefeed", "true")
        .option("startingcommit", 1)
        .load().writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect().map(r => (r.getAs[Long]("_commit"),
            r.getAs[String]("_change_type"),
            Seq[Any](r.getAs[Long]("ok"), r.getAs[Long]("ship_us"),
              r.getAs[String]("flag"), r.getAs[Long]("qty"),
              r.getAs[Long]("price_cents"))))
          events.synchronized { events ++= rows }
          ()
        }.start()
      try { q.processAllAvailable(); q.stop() } finally scala.util.Try(q.stop())
      val pre = events.filter(_._2 == "update_preimage").map(_._3).toSet
      val post = events.filter(_._2 == "update_postimage").map(_._3).toSet
      assert(pre == Set(Seq(5L, 5000L, "d05", 5L, 50L)),
        s"the matched key's OLD image pairs as update_preimage, got $pre")
      assert(post == Set(Seq(5L, 5000L, "d05", 50L, 999L)),
        s"the matched key's NEW image pairs as update_postimage, got $post")
      val delK = events.filter(_._2 == "delete").map(_._3(2)).toSet
      val insK = events.filter(_._2 == "insert").map(_._3(2)).toSet
      assert(insK -- delK == Set("x99"), "churn cancels; only the true insert survives")
      assert(!delK.contains("d05") && !insK.contains("d05"))
    } finally cleanup(root)
  }

  test("the native streaming sink inherits the key type: streamed epochs build KEYED blooms") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_strkey_ssrc").toString
    val dst = plant() // keyed store, 12 rows
    val ck = java.nio.file.Files.createTempDirectory("graft_strkey_sck").toString
    try {
      // a plain source store feeds the keyed destination through the
      // native sink; the epoch's task files must bloom on the KEY
      Seq((200L, 60000L, "z01", 2L, 6L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
        .coalesce(1)
        .write.format("graft-manifest").option("path", src).mode("overwrite").save()
      val q = spark.readStream.format("graft-manifest").option("path", src)
        .load()
        .writeStream.format("graft-manifest")
        .option("path", dst).option("checkpointLocation", ck)
        .start()
      try { q.processAllAvailable() } finally q.stop()
      assert(readAll(dst).size == 13)
      val entries = ManifestSource.readCommitLogEntries(dst)
      assert(entries.last.op == "stream-append" && entries.last.txn.isDefined)
      // keyed-bloom proof: a one-key mergeStr on the streamed key must
      // prune to exactly the streamed epoch's file
      val (rewritten, _, _, _) = ManifestSource.mergeStr(spark, dst,
        Seq(("z01", 200L, 60000L, 9L, 99L)))
      assert(rewritten == 1,
        "the streamed epoch's file must carry a string-keyed bloom")
      assert(readAll(dst).contains((200L, 60000L, "z01", 9L, 99L)))
    } finally {
      cleanup(src); cleanup(dst)
      scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(ck)))
    }
  }

  test("key identity is enforced and inherited") {
    val root = plant()
    try {
      // Long verbs refuse a keyed store
      val e1 = intercept[IllegalArgumentException] {
        ManifestSource.deleteKeysMoR(root, Seq(5L))
      }
      assert(e1.getMessage.contains("*Str"))
      intercept[IllegalArgumentException] {
        ManifestSource.merge(spark, root, Seq((5L, 5000L, "U", 5L, 9L)))
      }
      // string verbs refuse a plain store
      val plain = java.nio.file.Files.createTempDirectory("graft_strkey_plain").toString
      try {
        import spark.implicits._
        Seq((1L, 1000L, "A", 1L, 10L))
          .toDF("ok", "ship_us", "flag", "qty", "price_cents")
          .write.format("graft-manifest").option("path", plain).mode("overwrite").save()
        val e2 = intercept[IllegalArgumentException] {
          ManifestSource.deleteKeysStrMoR(plain, Seq("A"))
        }
        assert(e2.getMessage.contains("flag-keyed"))
      } finally cleanup(plain)
      // appends inherit the keyed blooms: a fresh key's merge still
      // prunes to the appended file alone
      import spark.implicits._
      Seq((200L, 60000L, "z01", 2L, 6L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
        .coalesce(1)
        .write.format("graft-manifest").option("path", root).mode("append").save()
      val (rewritten, _, _, _) = ManifestSource.mergeStr(spark, root,
        Seq(("z01", 200L, 60000L, 9L, 99L)))
      assert(rewritten == 1, "the appended file's bloom must be string-keyed")
      // a shallow clone inherits the property
      val dst = java.nio.file.Files.createTempDirectory("graft_strkey_cl").toString
      new java.io.File(dst).delete()
      try {
        ManifestSource.cloneShallow(root, dst)
        assert(ManifestSource.keyCol(dst).contains("flag"),
          "clone must inherit the key declaration")
      } finally cleanup(dst)
      // keycol on an append is refused (declared at creation only)
      val e3 = intercept[IllegalArgumentException] {
        Seq((300L, 70000L, "q01", 3L, 7L))
          .toDF("ok", "ship_us", "flag", "qty", "price_cents")
          .write.format("graft-manifest").option("path", root)
          .option("keycol", "flag").mode("append").save()
      }
      assert(e3.getMessage.contains("CREATION"))
    } finally cleanup(root)
  }
}
