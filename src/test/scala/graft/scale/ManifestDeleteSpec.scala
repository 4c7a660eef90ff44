package graft.scale

import graft.SparkSpec
import graft.sources.ManifestSource
import org.apache.spark.sql.functions._

/** [[ManifestSource.deleteKeys]] file-level mechanics on a planted
  * store (the q267 MERGE spec discipline applied to the delete verb):
  * a bloom false positive must carry the ORIGINAL file by reference,
  * a fully-emptied file must leave the manifest, the recomputed
  * per-file stats must stay exact (the q269 stats path answers from
  * them), and — the q274 composition — the change feed between the
  * pre- and post-delete generations must emit exactly the deleted
  * rows as `delete` events.
  */
class ManifestDeleteSpec extends SparkSpec {

  test("keyed delete: kept-by-reference, emptied-file removal, exact stats, change feed") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_del_spec").toString
    try {
      // 3 range files: f0 = ok 1..3 (us 1000..3000), f1 = ok 4..6,
      // f2 = ok 7..9 — ranges are disjoint so the repartitionByRange
      // file boundaries are deterministic
      val base = (1L to 9L).map(i => (i, i * 1000L, "A", i, i * 10L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      base.repartitionByRange(3, col("ship_us"))
        .write.format("graft-manifest").option("path", root).mode("overwrite").save()
      val m0 = ManifestSource.resolveManifest(root, None)
      val before = ManifestSource.readManifest(root, m0)
      assert(before.size == 3, s"expected 3 files, got ${before.size}")

      // delete ok 4,5,6 (empties the middle file) and ok 2 (partial)
      val (nRewritten, nKept, nDeleted, m1) =
        ManifestSource.deleteKeys(spark, root, Seq(2L, 4L, 5L, 6L))
      assert(nDeleted == 4L, s"deleted $nDeleted rows, want 4")
      val after = ManifestSource.readManifest(root, m1)
      // middle file gone entirely; the partial file rewritten; the
      // third either kept by reference (bloom miss) or rewritten
      // unchanged if its bloom false-positives — row content decides
      assert(after.map(_.rows).sum == 5L, s"manifest rows: ${after.map(_.rows)}")
      val beforeNames = before.map(_.file).toSet
      val keptByRef = after.map(_.file).count(beforeNames)
      assert(nKept == keptByRef + (3 - nRewritten - 1),
        s"kept-by-reference accounting: nKept=$nKept keptNames=$keptByRef")
      assert(keptByRef >= 1, "at least the untouched-range file must carry by name")

      // recomputed stats stay exact: the stats-pushdown read path
      // (zero data files) must agree with the surviving rows
      val survivors = (1L to 9L).filterNot(Set(2L, 4L, 5L, 6L))
      val agg = spark.read.format("graft-manifest").option("path", root).load()
        .agg(count(lit(1)), min(col("ship_us")), max(col("ship_us")),
          sum(col("qty")), sum(col("price_cents")))
        .collect().head
      assert(agg.getLong(0) == survivors.size.toLong)
      assert(agg.getLong(1) == survivors.min * 1000L)
      assert(agg.getLong(2) == survivors.max * 1000L)
      assert(agg.getLong(3) == survivors.sum)
      assert(agg.getLong(4) == survivors.map(_ * 10L).sum)

      // q274 composition: the change feed across the delete
      // generation is exactly the deleted rows as delete events
      val feed = Layout.manifestChangeFeed(spark, root, m0, m1)
        .collect().map(_.toSeq).toSet
      assert(feed == Set(2L, 4L, 5L, 6L).map(i =>
        Seq[Any]("delete", i, i * 1000L, "A", i, i * 10L)),
        s"change feed across the delete generation: $feed")
    } finally {
      scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(root)))
    }
  }

  test("bloom false positive carries the original file by reference") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_del_fp").toString
    try {
      val base = (1L to 6L).map(i => (i, i * 1000L, "A", i, i * 10L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      base.repartitionByRange(2, col("ship_us"))
        .write.format("graft-manifest").option("path", root).mode("overwrite").save()
      val before = ManifestSource.readManifest(root, ManifestSource.resolveManifest(root, None))
      // find a key that bloom-hits some file it is NOT in (a false
      // positive) but hits no file it IS in — absent keys only
      val fp = (1000L to 20000000L).find { k =>
        before.exists(e => e.bloom.exists(b => ManifestSource.bloomMightContain(b, k)))
      }
      fp.foreach { k =>
        val (nRewritten, _, nDeleted, m1) = ManifestSource.deleteKeys(spark, root, Seq(k))
        assert(nDeleted == 0L && nRewritten == 0,
          s"false-positive delete must rewrite nothing: $nRewritten/$nDeleted")
        val after = ManifestSource.readManifest(root, m1).map(_.file).toSet
        assert(after == before.map(_.file).toSet,
          "all files must carry by reference on a false-positive delete")
      }
      assert(fp.isDefined, "fixture drift: no bloom false positive found in range")
    } finally {
      scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(root)))
    }
  }
}
