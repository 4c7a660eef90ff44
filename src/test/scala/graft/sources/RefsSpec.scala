package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Named refs ([[ManifestSource.setRef]] — Iceberg tags/branches as
  * first-class pointers) on the planted 12-row store. Pins:
  *   - set / resolve through `.option("manifest", "ref:name")` /
  *     list / update / drop, with loud failures for a missing ref, an
  *     invalid name, and a nonexistent target;
  *   - vacuum keeps every ref'd generation and its files
  *     AUTOMATICALLY (the declarative retained-ref rule) and a
  *     dropped ref's generation collects on the next sweep;
  *   - a branch ref protects a write–audit–publish staged generation
  *     through the audit window without any vacuum keep list — the
  *     round's WAP footgun closed.
  */
class RefsSpec extends SparkSpec {

  private def plant(): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_refs").toString
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

  private def cleanup(root: String): Unit =
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))

  test("set / read through ref / list / update / drop, with loud failures") {
    val root = plant()
    try {
      val m0 = ManifestSource.resolveManifest(root, None)
      ManifestSource.setRef(root, "approved", m0)
      assert(ManifestSource.listRefs(root) == Map("approved" -> m0))
      ManifestSource.deleteKeys(spark, root, Seq(5L))
      // the ref still reads the tagged snapshot while the trunk moved
      assert(keys(root, Some("ref:approved")) == (1L to 12L).toSet)
      assert(keys(root) == (1L to 12L).toSet - 5L)
      // update: a ref is a moving pointer when you move it
      val m1 = ManifestSource.resolveManifest(root, None)
      ManifestSource.setRef(root, "approved", m1)
      assert(keys(root, Some("ref:approved")) == (1L to 12L).toSet - 5L)
      ManifestSource.dropRef(root, "approved")
      assert(ManifestSource.listRefs(root).isEmpty)
      intercept[IllegalArgumentException] {
        ManifestSource.resolveManifest(root, Some("ref:approved"))
      }
      intercept[IllegalArgumentException] {
        ManifestSource.setRef(root, "bad name", m1)
      }
      intercept[IllegalArgumentException] {
        ManifestSource.setRef(root, "ghost", "manifest-gen999.csv")
      }
    } finally cleanup(root)
  }

  test("vacuum keeps ref'd generations and files automatically; a dropped ref collects") {
    val root = plant()
    try {
      val m0 = ManifestSource.resolveManifest(root, None)
      ManifestSource.setRef(root, "run7", m0)
      ManifestSource.deleteKeys(spark, root, Seq(5L, 6L, 7L, 8L))
      // NO keep list: the ref alone must hold m0 and all its files
      ManifestSource.vacuum(root)
      assert(keys(root, Some("ref:run7")) == (1L to 12L).toSet,
        "a tagged snapshot must read byte-identically after vacuum")
      ManifestSource.dropRef(root, "run7")
      val (manifests, _) = ManifestSource.vacuum(root)
      assert(manifests >= 1, "the dropped ref's generation must collect")
      intercept[java.io.FileNotFoundException] {
        load(root, Some(m0)).collect()
      }
      assert(keys(root) == Set(1L, 2L, 3L, 4L, 9L, 10L, 11L, 12L))
    } finally cleanup(root)
  }

  test("a branch ref protects a WAP staged generation through the audit window") {
    val root = plant()
    try {
      val (staged, base, _) = ManifestSource.stageMerge(spark, root,
        Seq((5L, 5000L, "U", 5L, 999L), (100L, 50000L, "N", 1L, 5L)))
      ManifestSource.setRef(root, "audit", staged)
      // maintenance runs vacuum mid-audit with no keep list — the
      // branch must survive (previously this was the abort verb)
      ManifestSource.vacuum(root)
      assert(keys(root, Some("ref:audit")) == (1L to 12L).toSet + 100L,
        "the staged branch must survive a no-keep vacuum via its ref")
      ManifestSource.publishBranch(root, staged, base, Seq(5L, 100L))
      assert(keys(root) == (1L to 12L).toSet + 100L)
      ManifestSource.dropRef(root, "audit")
      ManifestSource.vacuum(root)
      // published data files are referenced by the trunk: intact
      assert(keys(root) == (1L to 12L).toSet + 100L)
    } finally cleanup(root)
  }
}
