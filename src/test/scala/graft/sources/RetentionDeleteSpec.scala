package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q251's deleteBelow: expired files drop unread, retained files
  * carry by reference, straddlers rewrite exactly, and the
  * pre-delete snapshot remains the audit trail.
  */
class RetentionDeleteSpec extends SparkSpec {

  test("minimal-IO delete: drop/rewrite/keep classes + time-travel audit") {
    val root = graft.scale.Layout.retentionStore(spark, sf)
    val cutoff = 820454400000000L // 1996-01-01Z
    val before = ManifestSource.readManifest(root, "manifest.csv")
    val total = before.map(_.rows).sum

    val (dropped, rewritten, kept) = ManifestSource.deleteBelow(spark, root, cutoff)
    assert(dropped > 0 && kept > 0, s"need all classes: d=$dropped r=$rewritten k=$kept")
    assert(dropped + rewritten + kept == before.length)

    val cur = ManifestSource.resolveManifest(root, None)
    val after = ManifestSource.readManifest(root, cur)
    // kept files carried by REFERENCE (same file names as before)
    val keptNames = after.map(_.file).filter(_.startsWith("part-w")).toSet
    assert(keptNames.size == kept && keptNames.subsetOf(before.map(_.file).toSet))
    // dropped files still on disk (audit) but unreferenced
    val droppedEntries = before.filter(_.max < cutoff)
    droppedEntries.foreach { e =>
      assert(new java.io.File(root, e.file).exists(), "purge GC is out-of-band")
      assert(!after.exists(_.file == e.file))
    }

    def snap(m: String) = spark.read.format("graft-manifest")
      .option("path", root).option("manifest", m).load()
    val latest = snap(cur)
    assert(latest.filter(col("ship_us") < cutoff).count() == 0, "expired rows must be gone")
    val truth = graft.Tables.lineitem(spark, sf)
      .filter(unix_micros(col("l_shipdate").cast("timestamp")) >= cutoff).count()
    assert(latest.count() == truth, "retained rows must be row-exact")
    assert(snap("manifest.csv").count() == total, "pre-delete snapshot is the audit trail")
  }
}
