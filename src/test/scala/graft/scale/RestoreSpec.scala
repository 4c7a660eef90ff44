package graft.scale

import graft.SparkSpec
import graft.sources.ManifestSource
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RESTORE ([[ManifestSource.restore]]) on the planted 12-row store
  * (ok = 1..12, ship_us = ok·1000, 3 range files). Pins the q290
  * contract:
  *   - restore is a FORWARD, metadata-only commit: content equals the
  *     pinned target row-for-row, no data file is written or changed,
  *     and the UNDONE generation stays pinnable (forward history);
  *   - the change feed across the restore generation is the INVERSE
  *     of the undone changes, and applying it onto the pre-restore
  *     state replays to the target (the CDF composition);
  *   - restoring to a merge-on-read (masked) snapshot re-applies the
  *     masks — `#dv:` lines travel with the entries;
  *   - restoring across a schema evolution reinstates the TARGET's
  *     schema: the old shape reads again and a post-restore append
  *     must match it;
  *   - vacuum keeps everything the restored generation references;
  *     restore of a vacuumed target fails loudly with the store
  *     intact.
  */
class RestoreSpec extends SparkSpec {

  private def plant(): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_restore").toString
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

  private def rows(root: String, pin: Option[String] = None): Set[Seq[Any]] =
    load(root, pin).collect().map(_.toSeq).toSet

  private def dataFileBytes(root: String): Map[String, Seq[Byte]] =
    new java.io.File(root).listFiles()
      .filter(f => f.getName.startsWith("part-"))
      .map { f =>
        // data files are binary parquet since the columnar data plane:
        // compare raw bytes, not a UTF-8 decode
        f.getName -> java.nio.file.Files.readAllBytes(f.toPath).toSeq
      }.toMap

  private def cleanup(root: String): Unit =
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))

  test("restore is forward and metadata-only: content equals the pin, history survives") {
    val root = plant()
    try {
      val m0 = ManifestSource.resolveManifest(root, None)
      val target = rows(root)
      ManifestSource.deleteKeys(spark, root, Seq(5L, 9L))
      val m1 = ManifestSource.resolveManifest(root, None)
      val afterDelete = rows(root)
      val before = dataFileBytes(root)
      val m2 = ManifestSource.restore(root, m0)
      assert(m2 != m0 && ManifestSource.resolveManifest(root, None) == m2,
        "restore must commit a NEW generation, not rewind the pointer")
      assert(dataFileBytes(root) == before, "restore must not touch data files")
      assert(rows(root) == target, "restored content must equal the pinned target")
      assert(rows(root, Some(m1)) == afterDelete,
        "the undone generation must stay pinnable (forward history)")
    } finally cleanup(root)
  }

  test("the restore generation's feed is the inverse of the undone delete and replays exactly") {
    val root = plant()
    try {
      val m0 = ManifestSource.resolveManifest(root, None)
      ManifestSource.deleteKeys(spark, root, Seq(5L, 9L))
      val m1 = ManifestSource.resolveManifest(root, None)
      val m2 = ManifestSource.restore(root, m0)
      val feed = Layout.manifestChangeFeed(spark, root, m1, m2).collect()
      assert(feed.map(r => (r.getAs[String]("change_type"), r.getAs[Long]("ok"))).toSet ==
        Set(("insert", 5L), ("insert", 9L)),
        "a rolled-back delete must emit forward INSERT events")
      // replay: pre-restore state + feed == restored state
      val replayed = rows(root, Some(m1)) ++ feed.map(r =>
        Seq[Any](r.getAs[Long]("ok"), r.getAs[Long]("ship_us"),
          r.getAs[String]("flag"), r.getAs[Long]("qty"), r.getAs[Long]("price_cents")))
      assert(replayed == rows(root, Some(m2)))
    } finally cleanup(root)
  }

  test("restoring to a masked snapshot re-applies deletion vectors") {
    val root = plant()
    try {
      ManifestSource.deleteKeysMoR(root, Seq(5L))
      val mMasked = ManifestSource.resolveManifest(root, None)
      ManifestSource.rewriteDeletes(spark, root)
      ManifestSource.restore(root, mMasked)
      val cur = ManifestSource.resolveManifest(root, None)
      assert(ManifestSource.readDvMap(root, cur).nonEmpty,
        "#dv: lines must travel with the restored entries")
      assert(rows(root).map(_.head) == ((1L to 12L).toSet - 5L))
    } finally cleanup(root)
  }

  test("restore across a schema evolution reinstates the target schema; appends must match it") {
    import spark.implicits._
    val root = plant()
    try {
      val m0 = ManifestSource.resolveManifest(root, None)
      ManifestSource.addColumn(root, "extra_cents")
      Seq((100L, 99000L, "E", 1L, 10L, 7L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "extra_cents")
        .write.format("graft-manifest").option("path", root).mode("append").save()
      assert(load(root).columns.contains("extra_cents"))
      ManifestSource.restore(root, m0)
      assert(!load(root).columns.contains("extra_cents"),
        "restore must reinstate the TARGET's (pre-evolution) schema")
      assert(rows(root).size == 12)
      // a post-restore append carrying the dropped column fails loudly
      val ex = intercept[Exception] {
        Seq((101L, 99500L, "E", 1L, 10L, 7L))
          .toDF("ok", "ship_us", "flag", "qty", "price_cents", "extra_cents")
          .write.format("graft-manifest").option("path", root).mode("append").save()
      }
      assert(ex.getMessage != null)
    } finally cleanup(root)
  }

  test("vacuum keeps the restored generation's references; a vacuumed target fails loudly") {
    val root = plant()
    try {
      val m0 = ManifestSource.resolveManifest(root, None)
      ManifestSource.deleteKeys(spark, root, Seq(5L))
      val m1 = ManifestSource.resolveManifest(root, None)
      ManifestSource.restore(root, m0)
      val target = rows(root)
      // vacuum with no keeps: m0/m1 manifests collect, but every data
      // file the RESTORED generation references must survive
      ManifestSource.vacuum(root)
      assert(rows(root) == target)
      // m1 (the undone delete) is gone — restoring to it now fails
      // loudly and the store is untouched
      val ex = intercept[IllegalArgumentException] {
        ManifestSource.restore(root, m1)
      }
      assert(ex.getMessage.contains("does not exist"))
      assert(rows(root) == target)
    } finally cleanup(root)
  }
}
